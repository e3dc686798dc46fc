"""Crytek Sponza (reference app: wurblpt-sponza.cpp:25-143).

Asset-gated: pass the path to sponza.obj (casual-effects.com/data); skips
with a message otherwise. Reproduces the reference's import transform
(yaw 90, scale 0.01, wurblpt-sponza.cpp:47-52), camera (lookfrom (0,1.7,0)
toward -z, vfov 70, :147-150) and surround/stereo options (:89-135).
"""
import numpy as np

from _obj_app import run_obj_app


def main():
    from wurblpt_tpu.core.transform import (Transformation,
                                            quat_from_axis_angle)

    def camera():
        from wurblpt_tpu.core.transform import from_lookat

        return from_lookat((0.0, 1.7, 0.0), (0.0, 1.7, -1.0))

    return run_obj_app("sponza", dict(
        transform=Transformation.make(
            rotation=quat_from_axis_angle((0.0, 1.0, 0.0), np.pi / 2),
            scale=(0.01, 0.01, 0.01)),
        camera=camera,
        vfov=70.0,
        asset_hint="sponza/sponza.obj",
    ))


if __name__ == "__main__":
    main()
