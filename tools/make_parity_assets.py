"""Dump the bench configs' scene data for the reference-build parity drivers
(parity/src/parity_configs.cpp): the rtiow sphere list (exact centers/
materials from the seeded generator), and the envmap cube faces + equirect
sky as tgdshim float arrays. With these, BASELINE.json gets measured
reference-CPU numbers for configs 2-4 (VERDICT round-3 item 7)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np

from wurblpt_tpu.utils import scenes
from wurblpt_tpu.scene import builder as B

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "parity"))
import tgdshim

out_dir = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "parity", "assets")
os.makedirs(out_dir, exist_ok=True)

# --- rtiow sphere list ------------------------------------------------------
sc = scenes.rtiow()
lines = []
for sph, _hot in sc._spheres:
    m = sc._materials[sc._resolve_material(sph.material)]
    c = np.asarray(sph.center, np.float64)
    if isinstance(m, B.Lambertian):
        a = np.asarray(m.albedo, np.float64)
        lines.append(f"0 {c[0]:.9g} {c[1]:.9g} {c[2]:.9g} {sph.radius:.9g} "
                     f"{a[0]:.9g} {a[1]:.9g} {a[2]:.9g} 0")
    elif isinstance(m, B.GGX):
        a = np.asarray(m.albedo, np.float64)
        r = m.roughness if np.isscalar(m.roughness) else m.roughness[0]
        lines.append(f"1 {c[0]:.9g} {c[1]:.9g} {c[2]:.9g} {sph.radius:.9g} "
                     f"{a[0]:.9g} {a[1]:.9g} {a[2]:.9g} {r:.9g}")
    elif isinstance(m, B.Glass):
        lines.append(f"2 {c[0]:.9g} {c[1]:.9g} {c[2]:.9g} {sph.radius:.9g} "
                     f"{float(m.ior):.9g} 0 0 0")
    else:
        raise TypeError(m)
with open(os.path.join(out_dir, "rtiow_spheres.txt"), "w") as f:
    f.write("\n".join(lines) + "\n")
print(f"rtiow: {len(lines)} spheres")

# --- envmap sky: equirect + 6 cube faces -----------------------------------
sky = scenes.procedural_sky()
tgdshim.save(os.path.join(out_dir, "terrain_sky.tgdshim"), sky)
faces = scenes._equirect_to_cube_faces(sky, 32)
for i, face in enumerate(faces):
    tgdshim.save(os.path.join(out_dir, f"sky_face{i}.tgdshim"),
                 np.ascontiguousarray(face, np.float32))
print("sky + 6 cube faces saved")
