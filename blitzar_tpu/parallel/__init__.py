from .distributed import (  # noqa: F401
    initialize,
    is_initialized,
    global_mesh,
    global_mesh2d,
)
