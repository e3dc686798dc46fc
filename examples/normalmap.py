"""Normal-mapping demo (reference app: wurblpt-normalmap.cpp).

A flat quad with a brick-pattern normal map lit by a moving-angle area light;
renders the lit image plus the ground-truth normal AOV so the perturbed
shading normals are directly inspectable (material.hpp:195-228 normalAt).
"""

import numpy as np

from _common import default_parser, render, save_png, setup_platform


def brick_normal_map(h=256, w=256, scale=2.5):
    """Tangent-space normal map of beveled bricks (host bake)."""
    ys, xs = np.meshgrid(np.arange(h) / h, np.arange(w) / w, indexing="ij")
    bricks_y = (ys * 4.0) % 1.0
    row = np.floor(ys * 4.0).astype(int)
    bricks_x = (xs * 4.0 + np.where(row % 2 == 0, 0.0, 0.5)) % 1.0
    # height: 1 inside brick, rolls off near mortar lines
    def roll(v, width=0.08):
        return np.clip(np.minimum(v, 1.0 - v) / width, 0.0, 1.0)
    hgt = np.minimum(roll(bricks_x), roll(bricks_y))
    dhx = np.roll(hgt, -1, 1) - np.roll(hgt, 1, 1)
    dhy = np.roll(hgt, -1, 0) - np.roll(hgt, 1, 0)
    n = np.stack([-scale * dhx, -scale * dhy, np.full_like(hgt, 2.0 / w)], -1)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    return ((n + 1.0) * 0.5).astype(np.float32)


def main():
    p = default_parser("normalmap", width=320, height=320, ssqrt=4, depth=4)
    args = p.parse_args()
    setup_platform(args)

    from wurblpt_tpu import CameraConfig, SceneStatic, SensorRGB, make_camera
    from wurblpt_tpu.core.transform import from_lookat
    from wurblpt_tpu.render.aov import get_ground_truth
    from wurblpt_tpu.scene import builder as B
    from wurblpt_tpu.scene import generator as G

    scene = B.Scene()
    nmap = B.ImageTexture(image=brick_normal_map(), srgb=False)
    scene.take_mesh_instance(B.MeshInstance(
        G.generate_quad(1.0, 1.0),
        B.Lambertian(albedo=(0.7, 0.45, 0.3), normal_map=nmap)))

    light = scene.take_material(B.LightDiffuse(radiance=(20.0,) * 3))
    scene.take_sphere(B.SphereObject((1.6, 1.2, 2.2), 0.25, light),
                      hot_spot=True)

    built = scene.build()
    cam = make_camera(transformation=from_lookat((0.0, -0.4, 2.4), (0, 0, 0)),
                      vfov_deg=42.0, width=args.width, height=args.height)
    img = render(built, cam, CameraConfig(), SensorRGB(), args)
    save_png(args.output, img)

    # Ground-truth material normals (perturbed by the map): the reference app
    # dumps the same AOV for inspection.
    static = SceneStatic.from_scene(built)
    gt = get_ground_truth(built, static, cam, CameraConfig(),
                          args.width, args.height,
                          aovs=("material_normal",))
    nm = np.asarray(gt["material_normal"])
    save_png(args.output.replace(".png", "-normals.png"),
             (nm + 1.0) * 0.5, tonemap=False)


if __name__ == "__main__":
    main()
