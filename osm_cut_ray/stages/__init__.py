from .pip import PIPStage, apply_pip  # noqa: F401
from .cells import assign_cells, with_cells  # noqa: F401
