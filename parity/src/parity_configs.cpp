/* Parity drivers for BASELINE configs 2-4, rendered by the REFERENCE build
 * (headers from /root/reference via parity/include, TGD shim in parity/tgd):
 *
 *   rtiow  - the exact bench sphere list (tools/make_parity_assets.py dumps
 *            the seeded generator's centers/materials) + constant sky env +
 *            OpenCV lens distortion camera; matches bench.py bench_rtiow
 *            (192x128, ssqrt 4, depth 8, k1=-0.1 k2=0.02 p1=0.001 p2=-0.001).
 *   envmap - glass/mirror/GGX spheres + ground quad under the same
 *            procedural-sky CUBE map with importance sampling (64); matches
 *            bench_envmap_furnace (128x128, ssqrt 4, depth 8).
 *   tof    - the AMCW ToF box room (five quads + small cube + LightTof at the
 *            camera, 40-degree half-angle, NIR radiance 8) recorded by
 *            SensorTofAmcw phase image 0; matches bench_tof (96x96, ssqrt 4,
 *            depth 6).
 *
 * Purpose: measured reference-CPU paths/s denominators for BASELINE.json
 * (VERDICT round-3 item 7). Usage: parity_configs <scene> <assets_dir> <out>
 */

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <chrono>
#include <string>
#include <vector>

#include <tgd/array.hpp>
#include <tgd/io.hpp>
#include <wurblpt/wurblpt.hpp>

using namespace WurblPT;

struct ConstEnv final : public EnvironmentMap
{
    vec4 radiance;
    explicit ConstEnv(const vec4& r) : radiance(r) {}
    virtual vec4 L(const vec3&, float = 0.0f) const override { return radiance; }
};

static Texture* faceTex(Scene& scene, const std::string& dir, int i)
{
    TGD::ArrayContainer img = TGD::load(dir + "/sky_face" + std::to_string(i) + ".tgdshim");
    return scene.take(createTextureImage(img));
}

int main(int argc, char** argv)
{
    if (argc != 4) {
        fprintf(stderr, "usage: %s <rtiow|envmap|tof> <assets_dir> <out>\n", argv[0]);
        return 1;
    }
    std::string which = argv[1];
    std::string assets = argv[2];
    const char* out = argv[3];

    Scene scene;
    unsigned int width, height;
    int ssqrt, depth;
    Sensor* sensor = nullptr;
    Camera* camera = nullptr;

    if (which == "rtiow") {
        width = 192; height = 128; ssqrt = 4; depth = 8;
        Material* ground = scene.take(new MaterialLambertian(vec3(0.5f)));
        scene.take(new Sphere(vec3(0.0f, -1000.0f, 0.0f), 1000.0f, ground));
        FILE* f = fopen((assets + "/rtiow_spheres.txt").c_str(), "r");
        if (!f) { fprintf(stderr, "missing rtiow_spheres.txt\n"); return 1; }
        int kind;
        float cx, cy, cz, r, p0, p1, p2, p3;
        while (fscanf(f, "%d %f %f %f %f %f %f %f %f",
                      &kind, &cx, &cy, &cz, &r, &p0, &p1, &p2, &p3) == 9) {
            Material* m = nullptr;
            if (kind == 0)
                m = scene.take(new MaterialLambertian(vec3(p0, p1, p2)));
            else if (kind == 1)
                m = scene.take(new MaterialGGX(vec4(p0, p1, p2, 0.0f), nullptr,
                                               vec2(p3, p3), nullptr));
            else
                m = scene.take(new MaterialGlass(vec4(0.0f), p0));
            scene.take(new Sphere(vec3(cx, cy, cz), r, m));
        }
        fclose(f);
        scene.take(new ConstEnv(vec4(0.7f, 0.8f, 1.0f, 0.833333f)));

        sensor = new SensorRGB(width, height);
        Optics optics(
                Projection(radians(30.0f), float(width) / height),
                LensDistortion(-0.1f, 0.02f, 0.0f, 0.001f, -0.001f));
        camera = new Camera(optics, Transformation::fromLookAt(
                vec3(13.0f, 2.0f, 3.0f), vec3(0.0f), vec3(0.0f, 1.0f, 0.0f)));
    } else if (which == "envmap") {
        width = 128; height = 128; ssqrt = 4; depth = 8;
        Material* ground = scene.take(new MaterialLambertian(vec3(0.4f)));
        Transformation groundT(vec3(0.0f, -0.5f, 0.0f),
                toQuat(radians(-90.0f), vec3(1.0f, 0.0f, 0.0f)),
                vec3(20.0f));
        scene.take(new MeshInstance(scene.take(generateQuad(groundT)), ground));
        scene.take(new Sphere(vec3(-1.2f, 0.0f, 0.0f), 0.5f,
                scene.take(new MaterialGlass(vec4(0.0f), 1.5f))));
        scene.take(new Sphere(vec3(0.0f, 0.0f, 0.0f), 0.5f,
                scene.take(new MaterialMirror(vec3(1.0f)))));
        scene.take(new Sphere(vec3(1.2f, 0.0f, 0.0f), 0.5f,
                scene.take(new MaterialGGX(vec4(0.8f, 0.6f, 0.3f, 0.0f), nullptr,
                                           vec2(0.15f, 0.15f), nullptr))));
        EnvironmentMapCube* env = new EnvironmentMapCube(
                faceTex(scene, assets, 0), faceTex(scene, assets, 1),
                faceTex(scene, assets, 2), faceTex(scene, assets, 3),
                faceTex(scene, assets, 4), faceTex(scene, assets, 5));
        env->initializeImportanceSampling(64);
        scene.take(env);

        sensor = new SensorRGB(width, height);
        Optics optics(Projection(radians(40.0f), 1.0f));
        camera = new Camera(optics, Transformation::fromLookAt(
                vec3(0.0f, 0.6f, 4.0f), vec3(0.0f), vec3(0.0f, 1.0f, 0.0f)));
    } else if (which == "tof") {
        width = 96; height = 96; ssqrt = 4; depth = 6;
        Material* white = scene.take(new MaterialLambertian(vec3(0.7f)));
        float h = 1.2f;
        struct Q { vec3 tr; vec3 ax; float ang; };
        const Q quads[5] = {
            { vec3(0.0f, 0.0f, -h), vec3(1.0f, 0.0f, 0.0f), 0.0f },
            { vec3(-h, 0.0f, 0.0f), vec3(0.0f, 1.0f, 0.0f), 90.0f },
            { vec3(h, 0.0f, 0.0f), vec3(0.0f, 1.0f, 0.0f), -90.0f },
            { vec3(0.0f, -h, 0.0f), vec3(1.0f, 0.0f, 0.0f), -90.0f },
            { vec3(0.0f, h, 0.0f), vec3(1.0f, 0.0f, 0.0f), 90.0f },
        };
        for (int i = 0; i < 5; i++) {
            Transformation T(quads[i].tr, toQuat(radians(quads[i].ang), quads[i].ax),
                             vec3(h));
            scene.take(new MeshInstance(scene.take(generateQuad(T)), white));
        }
        Transformation boxT(vec3(0.3f, -h + 0.25f, -0.4f), quat::null(), vec3(0.25f));
        scene.take(new MeshInstance(scene.take(generateCube(boxT)), white));
        Material* tof = scene.take(new LightTof(8.0f, radians(80.0f)));
        Transformation diskT(vec3(0.0f, 0.0f, h - 0.01f),
                toQuat(radians(180.0f), vec3(0.0f, 1.0f, 0.0f)), vec3(0.02f));
        scene.take(new MeshInstance(scene.take(generateDisk(diskT)), tof), HotSpot);

        SensorTofAmcw* ts = new SensorTofAmcw(width, height);
        ts->setPhaseIndex(0);
        sensor = ts;
        Optics optics(Projection(radians(60.0f), 1.0f));
        camera = new Camera(optics, Transformation::fromLookAt(
                vec3(0.0f, 0.0f, 1.19f), vec3(0.0f), vec3(0.0f, 1.0f, 0.0f)));
    } else {
        fprintf(stderr, "unknown scene %s\n", which.c_str());
        return 1;
    }

    Parameters params;
    params.maxPathComponents = depth;
    float t0 = 0.0f, t1 = 0.0f;
    scene.updateBVH(t0, t1);

    auto w0 = std::chrono::steady_clock::now();
    mcpt(*sensor, *camera, scene, ssqrt, t0, t1, params);
    auto w1 = std::chrono::steady_clock::now();
    double wall = std::chrono::duration<double>(w1 - w0).count();

    TGD::Array<float> img =
            (which == "tof")
            ? static_cast<SensorTofAmcw*>(sensor)->energy()
            : static_cast<SensorRGB*>(sensor)->result();
    TGD::save(img, out);
    long paths = (long)width * height * ssqrt * ssqrt;
    fprintf(stdout,
            "{\"scene\": \"%s\", \"paths\": %ld, \"wall_s\": %.4f, \"paths_per_s\": %.1f}\n",
            which.c_str(), paths, wall, paths / wall);
    return 0;
}
