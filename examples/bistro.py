"""Amazon Lumberyard Bistro exterior (reference app: wurblpt-bistro.cpp).

Asset-gated: pass the path to Exterior/exterior.obj; skips with a message
otherwise. Reproduces the reference's scale-0.01 import with hot spots
disabled (:36-48) and the exterior camera (:74-81); --interior switches to
the interior pose (then pass Interior/interior.obj).
"""
import sys

import numpy as np

from _obj_app import run_obj_app


def main():
    from wurblpt_tpu.core.transform import (Transformation,
                                            quat_from_axis_angle)
    from wurblpt_tpu.io.obj import ImportBits

    inside = "--interior" in sys.argv
    if inside:
        sys.argv.remove("--interior")

    def camera():
        if inside:
            return Transformation.make(
                translation=(0.663, 2.0, -2.06),
                rotation=quat_from_axis_angle((0.0, 1.0, 0.0),
                                              np.deg2rad(-89.35)))
        return Transformation.make(
            translation=(-13.8, 1.8, -3.3),
            rotation=quat_from_axis_angle((0.0, 1.0, 0.0),
                                          np.deg2rad(-102.0)))

    return run_obj_app("bistro", dict(
        transform=Transformation.make(scale=(0.01, 0.01, 0.01)),
        import_bits=ImportBits.DISABLE_HOT_SPOTS,
        camera=camera,
        vfov=45.0,
        asset_hint="bistro/Exterior/exterior.obj",
    ))


if __name__ == "__main__":
    main()
