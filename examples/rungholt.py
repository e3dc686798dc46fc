"""Rungholt Minecraft city (reference app: wurblpt-rungholt.cpp).

Asset-gated: pass the path to rungholt.obj; skips with a message otherwise.
Reproduces the reference's scale-0.05 inverted-Tf import (:36-42), the big
overhead area light (:44-50) and the elevated camera (:76-78, pitch -20 /
yaw 90 expressed as a look-at).
"""
import numpy as np

from _obj_app import run_obj_app


def main():
    from wurblpt_tpu.core.transform import (Transformation,
                                            quat_from_axis_angle)
    from wurblpt_tpu.io.obj import ImportBits

    def extra_content(scene_b):
        from wurblpt_tpu.scene import generator as G
        from wurblpt_tpu.scene.builder import LightDiffuse, MeshInstance

        lm = scene_b.take_material(LightDiffuse(radiance=(6.0, 6.0, 6.0)))
        scene_b.take_mesh_instance(MeshInstance(
            G.generate_quad(1.0, 1.0), lm,
            Transformation.make(
                translation=(0.0, 50.0, 0.0),
                rotation=quat_from_axis_angle((1.0, 0.0, 0.0), np.pi / 2),
                scale=(50.0, 50.0, 50.0))), hot_spot=True)

    def camera():
        from wurblpt_tpu.core.transform import from_lookat

        # reference pose: (25, 6, -1), yaw 90 / pitch -20 -> looking along
        # -x and slightly down; expressed as an equivalent look-at.
        return from_lookat((25.0, 6.0, -1.0),
                           (25.0 - np.cos(np.deg2rad(20.0)), 
                            6.0 - np.sin(np.deg2rad(20.0)), -1.0))

    return run_obj_app("rungholt", dict(
        transform=Transformation.make(scale=(0.05, 0.05, 0.05)),
        import_bits=ImportBits.INVERTED_TF,
        extra_content=extra_content,
        camera=camera,
        vfov=35.0,
        asset_hint="rungholt/rungholt.obj",
    ))


if __name__ == "__main__":
    main()
