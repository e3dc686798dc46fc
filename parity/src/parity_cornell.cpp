/* Parity driver: renders the reference Cornell box scene with the REFERENCE
 * implementation (headers included from /root/reference, built out-of-tree
 * with the TGD shim in parity/tgd) and dumps the raw HDR framebuffer plus
 * wall timing. This binary IS the reference renderer — it exists so the
 * wurblpt_tpu test suite can assert image parity and so BASELINE.json can
 * record measured reference CPU numbers (VERDICT.md "Next round" item 2).
 *
 * The scene is the reference app's default configuration
 * (wurblpt-cornellbox.cpp:43-229: white tall box, white short box, static);
 * the identical quad data lives in wurblpt_tpu/utils/cornell_data.py so both
 * renderers consume bit-identical scene definitions.
 *
 * Usage: parity_cornell <width> <height> <samples_sqrt> <out.tgdshim>
 */

#include <cstdio>
#include <cstdlib>
#include <chrono>

#include <tgd/array.hpp>
#include <tgd/io.hpp>
#include <wurblpt/wurblpt.hpp>

using namespace WurblPT;

static void quad(Scene& scene, Material* mat,
        vec3 p0, vec3 p1, vec3 p2, vec3 p3,
        vec3 n0, vec3 n1, vec3 n2, vec3 n3,
        bool hot = false, bool lightUv = false)
{
    std::vector<vec2> uv = lightUv
        ? std::vector<vec2>{ vec2(0.0f, 1.0f), vec2(0.0f, 0.0f), vec2(1.0f, 0.0f), vec2(1.0f, 1.0f) }
        : std::vector<vec2>{ vec2(0.0f, 0.0f), vec2(1.0f, 0.0f), vec2(1.0f, 1.0f), vec2(0.0f, 1.0f) };
    scene.take(new MeshInstance(scene.take(new Mesh(
            { p0, p1, p2, p3 }, { n0, n1, n2, n3 }, uv,
            { 0, 1, 2, 0, 2, 3 })),
            mat), hot ? HotSpot : ColdSpot);
}

static void quadN(Scene& scene, Material* mat,
        vec3 p0, vec3 p1, vec3 p2, vec3 p3, vec3 n, bool hot = false, bool lightUv = false)
{
    quad(scene, mat, p0, p1, p2, p3, n, n, n, n, hot, lightUv);
}

static void createCornellScene(Scene& scene)
{
    Material* white = scene.take(new MaterialLambertian(vec3(0.725f, 0.71f, 0.68f)));
    Material* red = scene.take(new MaterialLambertian(vec3(0.63f, 0.065f, 0.05f)));
    Material* green = scene.take(new MaterialLambertian(vec3(0.14f, 0.45f, 0.091f)));
    Material* light = scene.take(new LightDiffuse(vec3(4.0f)));

    // left wall (red), tilted shading normals per the app
    quad(scene, red,
            vec3(-1.01f, 0.0f, 0.99f), vec3(-0.99f, 0.0f, -1.04f),
            vec3(-1.02f, 1.99f, -1.04f), vec3(-1.02f, 1.99f, 0.99f),
            vec3(0.9999874f, 0.005025057f, 0.0f),
            vec3(0.9998379f, 0.01507292f, 0.009850611f),
            vec3(0.9999874f, 0.005025057f, 0.0f),
            vec3(0.9999874f, 0.005025057f, 0.0f));
    // right wall (green)
    quadN(scene, green,
            vec3(1.0f, 0.0f, -1.04f), vec3(1.0f, 0.0f, 0.99f),
            vec3(1.0f, 1.99f, 0.99f), vec3(1.0f, 1.99f, -1.04f),
            vec3(-1.0f, 0.0f, 0.0f));
    // floor
    quadN(scene, white,
            vec3(-1.01f, 0.0f, 0.99f), vec3(1.0f, 0.0f, 0.99f),
            vec3(1.0f, 0.0f, -1.04f), vec3(-0.99f, 0.0f, -1.04f),
            vec3(0.0f, 1.0f, 0.0f));
    // ceiling
    quadN(scene, white,
            vec3(-1.02f, 1.99f, 0.99f), vec3(-1.02f, 1.99f, -1.04f),
            vec3(1.0f, 1.99f, -1.04f), vec3(1.0f, 1.99f, 0.99f),
            vec3(0.0f, -1.0f, 0.0f));
    // back wall
    quadN(scene, white,
            vec3(-0.99f, 0.0f, -1.04f), vec3(1.0f, 0.0f, -1.04f),
            vec3(1.0f, 1.99f, -1.04f), vec3(-1.02f, 1.99f, -1.04f),
            vec3(0.0f, 0.0f, 1.0f));

    // short box
    quadN(scene, white,
            vec3(-0.05f, 0.0f, 0.57f), vec3(-0.05f, 0.6f, 0.57f),
            vec3(0.13f, 0.6f, 0.0f), vec3(0.13f, 0.0f, 0.0f),
            vec3(-0.9535826f, 0.0f, -0.3011314f));
    quadN(scene, white,
            vec3(0.7f, 0.0f, 0.17f), vec3(0.7f, 0.6f, 0.17f),
            vec3(0.53f, 0.6f, 0.75f), vec3(0.53f, 0.0f, 0.75f),
            vec3(0.9596285f, 0.0f, 0.2812705f));
    quadN(scene, white,
            vec3(0.53f, 0.0f, 0.75f), vec3(0.7f, 0.0f, 0.17f),
            vec3(0.13f, 0.0f, 0.0f), vec3(-0.05f, 0.0f, 0.57f),
            vec3(0.0f, -1.0f, 0.0f));
    quadN(scene, white,
            vec3(0.53f, 0.6f, 0.75f), vec3(0.7f, 0.6f, 0.17f),
            vec3(0.13f, 0.6f, 0.0f), vec3(-0.05f, 0.6f, 0.57f),
            vec3(0.0f, 1.0f, 0.0f));
    quadN(scene, white,
            vec3(0.13f, 0.0f, 0.0f), vec3(0.13f, 0.6f, 0.0f),
            vec3(0.7f, 0.6f, 0.17f), vec3(0.7f, 0.0f, 0.17f),
            vec3(0.2858051f, 0.0f, -0.9582878f));
    quadN(scene, white,
            vec3(0.53f, 0.0f, 0.75f), vec3(0.53f, 0.6f, 0.75f),
            vec3(-0.05f, 0.6f, 0.57f), vec3(-0.05f, 0.0f, 0.57f),
            vec3(-0.2963993f, 0.0f, 0.9550642f));

    // tall box
    quadN(scene, white,
            vec3(-0.53f, 0.0f, 0.09f), vec3(-0.53f, 1.2f, 0.09f),
            vec3(-0.71f, 1.2f, -0.49f), vec3(-0.71f, 0.0f, -0.49f),
            vec3(-0.9550642f, 0.0f, 0.2963992f));
    quadN(scene, white,
            vec3(-0.14f, 0.0f, -0.67f), vec3(-0.14f, 1.2f, -0.67f),
            vec3(0.04f, 1.2f, -0.09f), vec3(0.04f, 0.0f, -0.09f),
            vec3(0.9550642f, 0.0f, -0.2963992f));
    quadN(scene, white,
            vec3(-0.53f, 0.0f, 0.09f), vec3(0.04f, 0.0f, -0.09f),
            vec3(-0.14f, 0.0f, -0.67f), vec3(-0.71f, 0.0f, -0.49f),
            vec3(0.0f, -1.0f, 0.0f));
    quadN(scene, white,
            vec3(-0.53f, 1.2f, 0.09f), vec3(0.04f, 1.2f, -0.09f),
            vec3(-0.14f, 1.2f, -0.67f), vec3(-0.71f, 1.2f, -0.49f),
            vec3(0.0f, 1.0f, 0.0f));
    quadN(scene, white,
            vec3(-0.71f, 0.0f, -0.49f), vec3(-0.71f, 1.2f, -0.49f),
            vec3(-0.14f, 1.2f, -0.67f), vec3(-0.14f, 0.0f, -0.67f),
            vec3(-0.3011314f, 0.0f, -0.9535826f));
    quadN(scene, white,
            vec3(0.04f, 0.0f, -0.09f), vec3(0.04f, 1.2f, -0.09f),
            vec3(-0.53f, 1.2f, 0.09f), vec3(-0.53f, 0.0f, 0.09f),
            vec3(0.3011314f, 0.0f, 0.9535826f));

    // light panel
    quadN(scene, light,
            vec3(-0.24f, 1.98f, 0.16f), vec3(-0.24f, 1.98f, -0.22f),
            vec3(0.23f, 1.98f, -0.22f), vec3(0.23f, 1.98f, 0.16f),
            vec3(0.0f, -1.0f, 0.0f), /*hot=*/true, /*lightUv=*/true);
}

int main(int argc, char** argv)
{
    if (argc != 5) {
        fprintf(stderr, "usage: %s <width> <height> <samples_sqrt> <out>\n", argv[0]);
        return 1;
    }
    unsigned int width = atoi(argv[1]);
    unsigned int height = atoi(argv[2]);
    int samples_sqrt = atoi(argv[3]);
    const char* out = argv[4];

    Scene scene;
    createCornellScene(scene);

    SensorRGB sensor(width, height);
    Optics optics(Projection(radians(50.0f), sensor.aspectRatio()));
    vec3 lookfrom(0.0f, 1.0f, 3.2f);
    vec3 lookat(0.0f, 1.0f, -1.0f);
    vec3 up(0.0f, 1.0f, 0.0f);
    Camera camera(optics, Transformation::fromLookAt(lookfrom, lookat, up));

    Parameters params;
    float t0 = 0.0f, t1 = 0.0f;
    scene.updateBVH(t0, t1);

    auto w0 = std::chrono::steady_clock::now();
    mcpt(sensor, camera, scene, samples_sqrt, t0, t1, params);
    auto w1 = std::chrono::steady_clock::now();
    double wall = std::chrono::duration<double>(w1 - w0).count();

    TGD::Array<float> img = sensor.result();
    img.globalTagList().set("WALL_SECONDS", std::to_string(wall));
    TGD::save(img, out);
    long rays = (long)width * height * samples_sqrt * samples_sqrt;
    fprintf(stdout, "{\"paths\": %ld, \"wall_s\": %.4f, \"paths_per_s\": %.1f}\n",
            rays, wall, rays / wall);
    return 0;
}
