"""San Miguel (reference app: wurblpt-san-miguel.cpp).

Asset-gated: pass the path to san-miguel.obj; skips with a message
otherwise. Reproduces the reference's import flags (lights disabled,
two-sided materials, inverted Tf, :38-40), the constant-white environment
(:42-43) and the courtyard camera (:66-70).
"""
import numpy as np

from _obj_app import run_obj_app


def main():
    from wurblpt_tpu.core.transform import (Transformation,
                                            quat_from_axis_angle)
    from wurblpt_tpu.io.obj import ImportBits
    from wurblpt_tpu.scene.builder import EnvironmentMapConstant

    def camera():
        return Transformation.make(
            translation=(6.33516, 0.600968 + 1.61, -2.13264),
            rotation=quat_from_axis_angle((0.0, 1.0, 0.0),
                                          np.deg2rad(-99.3793)))

    return run_obj_app("san-miguel", dict(
        import_bits=(ImportBits.DISABLE_LIGHT_SOURCES
                     | ImportBits.TWO_SIDED_MATERIALS
                     | ImportBits.INVERTED_TF),
        envmap=lambda: EnvironmentMapConstant(radiance=(1.0, 1.0, 1.0)),
        camera=camera,
        vfov=45.0,
        asset_hint="san-miguel/san-miguel.obj",
    ))


if __name__ == "__main__":
    main()
