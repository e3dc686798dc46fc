"""Export the bvh_100k bench scene (utils.scenes.terrain_city) to OBJ/MTL +
the procedural sky as a tgdshim float array, for parity/src/parity_mesh.cpp —
the REFERENCE build renders the same geometry/camera/depth/spp so
BASELINE.json can record a measured reference-CPU paths/s on a mesh-scale
scene (VERDICT round-3 "Missing #1")."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

from wurblpt_tpu.io.obj import export_scene_to_obj
from wurblpt_tpu.utils import scenes

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "parity"))
import tgdshim

out_dir = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "parity", "assets")
os.makedirs(out_dir, exist_ok=True)

scene = scenes.terrain_city(seed=3)
export_scene_to_obj(scene, os.path.join(out_dir, "terrain_city.obj"))
# Flipped vertically for the reference: our equirect convention puts numpy
# row 0 at the zenith, the reference's v = asin(y)/pi + 0.5 reads the zenith
# from the LAST stored TGD row (round-5 fix found by the city twin — the
# round-4 terrain denominator was measured with a vertically flipped sky).
sky = scenes.procedural_sky()
tgdshim.save(os.path.join(out_dir, "terrain_sky.tgdshim"), sky[::-1].copy())
print("exported", os.path.join(out_dir, "terrain_city.obj"), "sky", sky.shape)
