/* Parity driver: renders the city_many_lights benchmark scene with the
 * REFERENCE implementation (headers from /root/reference via parity/include,
 * TGD shim in parity/tgd; powitacq compiled as a second TU like the
 * reference's own powitacq.cpp). The scene is the EXACT round-trip OBJ the
 * bench scene is built from (tools/make_parity_city.py passes the bench
 * scene's workdir): 249k tris, ModPhong buildings, 96+96 emissive windows as
 * HotSpots via the importer's emissive heuristic (import.hpp:497), GGX /
 * mirror spheres, plus the post-roundtrip extras the bench adds in Python —
 * a measured-RGL sphere (MaterialRGL over the synthetic table written as a
 * powitacq tensor file) and the night-sky equirect envmap with importance
 * sampling (32), matching utils/scenes.city_night(seed=7).
 *
 * Purpose: the missing reference-CPU denominator + radiance-parity golden
 * for BASELINE config 5 (VERDICT round-4 Missing #3). Camera matches
 * bench.py bench_city_many_lights: 360-degree surround STEREO (top/bottom),
 * eye distance 0.065, lookat (0,3.5,14)->(0,1.5,0), maxPathComponents 4.
 *
 * Usage: parity_city <assets_dir> <width> <height> <ssqrt> <out.tgdshim>
 */

#define TINYOBJLOADER_IMPLEMENTATION

#include <cstdio>
#include <cstdlib>
#include <chrono>
#include <string>

#include <tgd/array.hpp>
#include <tgd/io.hpp>
#include <wurblpt/wurblpt.hpp>
#include <wurblpt/import.hpp>
#include <wurblpt/material_rgl.hpp>

using namespace WurblPT;

int main(int argc, char** argv)
{
    if (argc != 6 && argc != 7) {
        fprintf(stderr, "usage: %s <assets_dir> <w> <h> <ssqrt> <out> [noemit]\n",
                argv[0]);
        return 1;
    }
    bool noemit = (argc == 7 && std::string(argv[6]) == "noemit");
    std::string assets = argv[1];
    unsigned int width = atoi(argv[2]);
    unsigned int height = atoi(argv[3]);
    int samples_sqrt = atoi(argv[4]);
    const char* out = argv[5];

    Scene scene;
    if (!importIntoScene(scene, assets + "/city_night.obj", Transformation(),
            noemit ? ImportBitDisableLightSources : 0)) {
        fprintf(stderr, "import failed\n");
        return 1;
    }

    /* post-roundtrip extras, exactly as utils/scenes.city_night adds them */
    Mesh* sph = importGeometry(assets + "/city_rgl_sphere.obj");
    if (!sph) {
        fprintf(stderr, "sphere import failed\n");
        return 1;
    }
    Material* rgl = scene.take(new MaterialRGL(assets + "/city_rgl.bsdf"));
    scene.take(new MeshInstance(scene.take(sph), rgl));

    TGD::ArrayContainer sky = TGD::load(assets + "/city_sky.tgdshim");
    Texture* tex = scene.take(createTextureImage(sky));
    EnvironmentMapEquiRect* env = new EnvironmentMapEquiRect(tex);
    env->initializeImportanceSampling(32);
    scene.take(env);

    SensorRGB sensor(width, height);
    /* surround cameras ignore the optics (camera.hpp:81) */
    Optics optics(Projection(radians(50.0f), sensor.aspectRatio()));
    Camera camera(Camera::Surround_360, 0.065f, optics,
            Transformation::fromLookAt(
                    vec3(0.0f, 3.5f, 14.0f), vec3(0.0f, 1.5f, 0.0f),
                    vec3(0.0f, 1.0f, 0.0f)));

    Parameters params;
    params.maxPathComponents = 4;
    float t0 = 0.0f, t1 = 0.0f;

    auto b0 = std::chrono::steady_clock::now();
    scene.updateBVH(t0, t1);
    auto b1 = std::chrono::steady_clock::now();

    auto w0 = std::chrono::steady_clock::now();
    mcpt(sensor, camera, scene, samples_sqrt, t0, t1, params);
    auto w1 = std::chrono::steady_clock::now();
    double wall = std::chrono::duration<double>(w1 - w0).count();
    double bvh_s = std::chrono::duration<double>(b1 - b0).count();

    TGD::Array<float> img = sensor.result();
    img.globalTagList().set("WALL_SECONDS", std::to_string(wall));
    TGD::save(img, out);
    long paths = (long)width * height * samples_sqrt * samples_sqrt;
    fprintf(stdout,
            "{\"scene\": \"city\", \"paths\": %ld, \"wall_s\": %.4f, "
            "\"paths_per_s\": %.1f, \"bvh_build_s\": %.3f}\n",
            paths, wall, paths / wall, bvh_s);
    return 0;
}
