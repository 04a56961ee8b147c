"""Reference-style import path: ``from xmhw_tpu.xmhw import threshold,
detect`` mirrors the reference's ``from xmhw.xmhw import threshold,
detect`` (reference: docs/gettingstarted.rst:19)."""

from .api import detect, land_check, threshold  # noqa: F401
from .exception import XmhwException  # noqa: F401

__all__ = ["threshold", "detect", "land_check", "XmhwException"]
