/* Minimal REFERENCE-build probe: a Lambertian plane (albedo 0.5) under a
 * CONSTANT-radiance equirect environment — the furnace invariant says plane
 * pixels must read exactly 0.5. Toggles: importance sampling on/off, and
 * MaterialLambertian vs imported-style MaterialModPhong. Used to localize
 * the 4x sky-lit-surface discrepancy the city twin exposed (round 5).
 *
 * Usage: ref_probe <is|nois> <lam|phong> [res]
 */
#include <cstdio>
#include <cstring>
#include <string>

#include <cstdlib>

#include <tgd/array.hpp>
#include <tgd/io.hpp>
#include <wurblpt/wurblpt.hpp>

using namespace WurblPT;

int main(int argc, char** argv)
{
    bool useIS = argc > 1 && std::strcmp(argv[1], "is") == 0;
    bool phong = argc > 2 && std::strcmp(argv[2], "phong") == 0;
    float albedo = argc > 4 ? 0.25f : 0.5f;
    int res = argc > 3 ? atoi(argv[3]) : 32;

    Scene scene;
    Material* mat;
    if (phong)
        mat = scene.take(new MaterialModPhong(vec3(albedo), vec3(0.0f), 1.0f));
    else
        mat = scene.take(new MaterialLambertian(vec3(albedo)));
    Transformation T(vec3(0.0f), toQuat(radians(-90.0f), vec3(1.0f, 0.0f, 0.0f)),
                     vec3(50.0f));
    scene.take(new MeshInstance(scene.take(generateQuad(T)), mat));

    /* constant-1 equirect sky texture, or a sky loaded from argv[4] */
    TGD::ArrayContainer sky;
    if (argc > 4) {
        sky = TGD::load(argv[4]);
    } else {
        TGD::Array<float> s1({64, 32}, 3);
        float* p = static_cast<float*>(s1.data());
        for (size_t i = 0; i < s1.elementCount() * 3; i++)
            p[i] = 1.0f;
        sky = s1;
    }
    Texture* tex = scene.take(createTextureImage(sky));
    EnvironmentMapEquiRect* env = new EnvironmentMapEquiRect(tex);
    if (useIS)
        env->initializeImportanceSampling(res);
    scene.take(env);

    unsigned int w = 48, h = 36;
    SensorRGB sensor(w, h);
    Optics optics(Projection(radians(45.0f), sensor.aspectRatio()));
    Camera camera(optics, Transformation::fromLookAt(
            vec3(14.0f, 9.0f, 14.0f), vec3(0.0f, 0.5f, 0.0f),
            vec3(0.0f, 1.0f, 0.0f)));

    Parameters params;
    params.maxPathComponents = 8;
    scene.updateBVH(0.0f, 0.0f);
    mcpt(sensor, camera, scene, 4, 0.0f, 0.0f, params);

    const TGD::Array<float>& img = sensor.result();
    /* bottom third of the image looks straight down at the plane */
    double acc = 0.0; long n = 0;
    for (unsigned int y = 0; y < h / 3; y++)       /* TGD row 0 = bottom */
        for (unsigned int x = 0; x < w; x++) {
            acc += static_cast<const float*>(img.get({x, y}))[0];
            n++;
        }
    printf("%s %s: plane mean %.4f (expect 0.5)\n",
           useIS ? "IS" : "noIS", phong ? "phong" : "lambert", acc / n);
    return 0;
}
