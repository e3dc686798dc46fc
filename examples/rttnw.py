"""Ray Tracing: The Next Week final scene (reference app: wurblpt-rttnw.cpp).

Composes: a ground of random-height boxes, an area light, MOTION-BLURRED
animated sphere, glass + GGX spheres, a blue subsurface medium inside a glass
boundary, a global thin mist, an image-textured "earth" sphere, a
Perlin-TURBULENCE noise sphere, and a cube of small spheres.

Optional --light-slice renders a light-in-flight window (SensorRGB
distance-to-light gate, sensor_rgb.hpp:63-80 / wurblpt-rttnw.cpp:160-215).
"""

import numpy as np

from _common import default_parser, render, save_png, setup_platform


def earth_texture(h=128, w=256, seed=5):
    """Procedural stand-in for land_shallow_topo_2048.jpg (no assets in the
    sandbox): continents from thresholded smooth noise over ocean blue."""
    rng = np.random.default_rng(seed)
    base = rng.random((10, 20)).astype(np.float32)
    ys = np.linspace(0, 10, h, endpoint=False)
    xs = np.linspace(0, 20, w, endpoint=False)
    y0 = np.floor(ys).astype(int) % 10
    x0 = np.floor(xs).astype(int) % 20
    fy = (ys - np.floor(ys))[:, None]
    fx = (xs - np.floor(xs))[None, :]
    c00 = base[np.ix_(y0, x0)]
    c01 = base[np.ix_(y0, (x0 + 1) % 20)]
    c10 = base[np.ix_((y0 + 1) % 10, x0)]
    c11 = base[np.ix_((y0 + 1) % 10, (x0 + 1) % 20)]
    hgt = (c00 * (1 - fx) + c01 * fx) * (1 - fy) + (c10 * (1 - fx) + c11 * fx) * fy
    land = hgt > 0.55
    img = np.empty((h, w, 3), np.float32)
    img[...] = (0.05, 0.15, 0.45)            # ocean
    img[land] = (0.15, 0.45, 0.12)           # land
    img[hgt > 0.75] = (0.55, 0.5, 0.4)       # mountains
    return img


def main():
    p = default_parser("rttnw", width=320, height=320, ssqrt=5, depth=12)
    p.add_argument("--light-slice", type=float, default=None,
                   help="distance-to-light window start (width 0.25)")
    args = p.parse_args()
    setup_platform(args)

    from wurblpt_tpu import CameraConfig, SensorRGB, make_camera
    from wurblpt_tpu.core.transform import Transformation, from_lookat
    from wurblpt_tpu.scene import builder as B
    from wurblpt_tpu.scene import generator as G
    from wurblpt_tpu.scene.builder import AnimationKeyframes
    from wurblpt_tpu.scene.ir import TextureType

    rng = np.random.default_rng(42)
    scene = B.Scene()

    # Ground: 20x20 boxes of random height (wurblpt-rttnw.cpp:58-70)
    ground = scene.take_material(B.Lambertian(albedo=(0.48, 0.83, 0.53)))
    boxes = []
    for i in range(20):
        for j in range(20):
            w0 = 1.0
            x0 = -10.0 + i * w0
            z0 = -10.0 + j * w0
            y1 = float(rng.uniform(0.01, 1.01))
            tf = Transformation.make(
                translation=(x0 + w0 / 2, y1 / 2, z0 + w0 / 2),
                scale=(w0 / 2, y1 / 2, w0 / 2))
            boxes.append(B.MeshInstance(G.generate_cube(1.0), ground, tf))
    for b in boxes:
        scene.take_mesh_instance(b)

    # Area light (:72-77): quad rotated to face DOWN (+z normal -> -y)
    from wurblpt_tpu.core.transform import quat_from_axis_angle
    light = scene.take_material(B.LightDiffuse(radiance=(7.0, 7.0, 7.0)))
    ltf = Transformation.make(
        translation=(2.75, 5.54, 2.995),
        rotation=quat_from_axis_angle(np.array([1.0, 0, 0], np.float32),
                                      np.pi / 2),
        scale=(1.65, 1.325, 1.0))
    scene.take_mesh_instance(B.MeshInstance(G.generate_quad(1.0, 1.0), light, ltf),
                             hot_spot=True)

    # Motion-blurred sphere (:80-88): keyframed translation, t0 != t1 render
    anim = AnimationKeyframes(
        times=[0.0, 1.0],
        transformations=[
            Transformation.make(translation=(2.0, 2.0, 0.45)),
            Transformation.make(translation=(2.3, 2.0, 0.45)),
        ])
    aid = scene.take_animation(anim)
    moving = scene.take_material(B.Lambertian(albedo=(0.7, 0.3, 0.1)))
    scene.take_sphere(B.SphereObject((0.0, 0.0, 0.0), 0.5, moving, animation=aid))

    scene.take_sphere(B.SphereObject((2.6, 1.5, 0.45), 0.5,
                                     B.Glass(ior=1.5)))
    scene.take_sphere(B.SphereObject((0.0, 1.5, 1.45), 0.5,
                                     B.GGX(albedo=(0.8, 0.8, 0.9), roughness=0.1)))

    # Blue subsurface: dense medium inside a glass sphere (:95-96)
    scene.take_sphere(B.SphereObject((4.0, 1.7, 1.0), 0.7, B.Glass(ior=1.5)))
    scene.take_medium(B.MediumObject(
        boundary=B.SphereObject((4.0, 1.7, 1.0), 0.7, 0),
        density=6.0, phase=B.PhaseIso(albedo=(0.2, 0.4, 0.9))))
    # Global thin mist (:97-98)
    scene.take_medium(B.MediumObject(
        boundary=B.SphereObject((0.0, 2.0, 0.0), 30.0, 0),
        density=0.01, phase=B.PhaseIso(albedo=(1.0, 1.0, 1.0))))

    # Earth-textured sphere (:100-103)
    etex = B.ImageTexture(image=earth_texture(), srgb=False)
    scene.take_sphere(B.SphereObject((2.0, 2.8, -1.0), 0.5,
                                     B.Lambertian(albedo=etex)))

    # Perlin-turbulence sphere (:105-107; TexturePerlinNoise::turbulence)
    ptex = B.NoiseTexture(kind=TextureType.PERLIN_NOISE, octaves=7,
                          frequency=6.0, gain=0.5, turbulence=True)
    scene.take_sphere(B.SphereObject((2.2, 3.0, 3.0), 0.8,
                                     B.Lambertian(albedo=ptex)))

    # Cube of small spheres (:109-113)
    white = B.Lambertian(albedo=(0.73, 0.73, 0.73))
    wid = scene.take_material(white)
    for _ in range(200):
        c = rng.uniform(0.0, 1.0, 3).astype(np.float32) * 1.65
        scene.take_sphere(B.SphereObject(
            (float(c[0]) - 1.0, float(c[1]) + 2.7, float(c[2]) + 2.5), 0.1, wid))

    built = scene.build()
    cam = make_camera(
        transformation=from_lookat((4.78, 2.78, -6.0), (2.78, 2.78, 0.0)),
        vfov_deg=40.0, width=args.width, height=args.height)
    if args.light_slice is not None:
        sensor = SensorRGB(dtl_min=args.light_slice,
                           dtl_max=args.light_slice + 0.25)
    else:
        sensor = SensorRGB()
    img = render(built, cam, CameraConfig(), sensor, args, t0=0.0, t1=1.0)
    save_png(args.output, img)


if __name__ == "__main__":
    main()
