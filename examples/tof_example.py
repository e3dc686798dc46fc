"""AMCW Time-of-Flight simulation (reference apps: wurblpt-tof-example.cpp,
wurblpt-tof-hcibox.cpp).

Renders the 4 phase images at their shifted capture times, reconstructs
distance/amplitude/intensity, and compares the ToF distance against the
ground-truth distance AOV.
"""

import numpy as np

from _common import default_parser, setup_platform


def main():
    p = default_parser("tof_example", width=96, height=96, ssqrt=3, depth=4)
    p.add_argument("--shot-noise", type=float, default=0.0)
    args = p.parse_args()
    setup_platform(args)

    import dataclasses

    import jax

    from wurblpt_tpu import CameraConfig, RenderParams, SceneStatic, make_camera
    from wurblpt_tpu.render.aov import get_ground_truth
    from wurblpt_tpu.render.integrator import render_frame
    from wurblpt_tpu.render.sensor import SensorTofAmcw
    from wurblpt_tpu.utils import scenes

    scene = scenes.tof_box().build()
    static = SceneStatic.from_scene(scene)
    cam = make_camera(vfov_deg=60.0, width=args.width, height=args.height)
    # camera sits at the +z wall looking down -z, like the ToF light.
    from wurblpt_tpu.core.transform import from_lookat

    pose = from_lookat((0.0, 0.0, 1.18), (0.0, 0.0, 0.0))
    cam = cam._replace(transformation=pose)

    base = SensorTofAmcw()
    params = RenderParams(max_path_components=args.max_depth)

    phases = []
    for i in range(4):  # wurblpt-tof-example.cpp:109-141 capture loop
        sensor = dataclasses.replace(base, phase_index=i)
        t0 = sensor.phase_start_time(i)
        t1 = t0 + sensor.exposure_time
        acc = render_frame(scene, static, cam, CameraConfig(), sensor,
                           args.width, args.height, args.samples_sqrt,
                           t0, t1, params)
        phases.append(sensor.phase(acc, shot_noise_factor=args.shot_noise, seed=i))
        print(f"phase image {i} done")

    distance, amplitude, intensity = base.result(phases)

    gt = get_ground_truth(scene, static, cam, CameraConfig(),
                          args.width, args.height, aovs=("distance",))
    gt_dist = np.asarray(gt["distance"])[..., 0]
    d = np.asarray(distance)
    mask = gt_dist > 0
    err = np.abs(d - gt_dist)[mask]
    print(f"ToF distance vs GT: mean abs err = {err.mean():.4f} m, "
          f"p95 = {np.percentile(err, 95):.4f} m")
    np.savez(args.output.replace(".png", ".npz"), distance=d,
             amplitude=np.asarray(amplitude), intensity=np.asarray(intensity),
             gt_distance=gt_dist)
    print(f"wrote {args.output.replace('.png', '.npz')}")


if __name__ == "__main__":
    main()
