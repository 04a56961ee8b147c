from .mesh import CELL_AXIS, cell_mesh, cell_sharding, pad_cells, replicated

__all__ = ["CELL_AXIS", "cell_mesh", "cell_sharding", "pad_cells",
           "replicated"]
