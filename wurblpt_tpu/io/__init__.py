"""Scene I/O: OBJ/MTL import and export, texture file loading."""

from .obj import (
    ImportBits,
    export_scene_to_obj,
    import_geometry,
    import_into_scene,
    import_texture,
    load_obj_raw,
)

__all__ = [
    "ImportBits",
    "export_scene_to_obj",
    "import_geometry",
    "import_into_scene",
    "import_texture",
    "load_obj_raw",
]
