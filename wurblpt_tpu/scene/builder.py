"""Host-side scene construction: ergonomic classes -> flat SceneArrays.

Mirrors the reference's ``Scene::take(...)`` ownership API (``scene.hpp:86-141``)
and ``Mesh``/``MeshInstance`` (``mesh.hpp``), but "building" means flattening into
the SoA pytrees of :mod:`wurblpt_tpu.scene.ir` with numpy, then shipping to device.
Static instance transforms are baked into world-space triangles (the reference's
TRANSFORM template specialization, ``hitable_triangle.hpp:446-511``); animated
instances keep object-space geometry plus an animation index that the device
kernels evaluate per ray time.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import List, Optional, Sequence, Tuple, Union

import numpy as np
import jax.numpy as jnp

from ..core.transform import Transformation
from .ir import (
    AnimTable,
    EnvMapArrays,
    MaterialFlags,
    MaterialTable,
    MaterialType,
    SceneArrays,
    Spheres,
    TextureTable,
    TextureType,
    Triangles,
    empty_envmap,
)

_f32 = np.float32


def _vec4(c, nir: Optional[float] = None) -> np.ndarray:
    """Promote a color to RGB+NIR vec4; NIR defaults to mean(RGB) like the
    reference's Lambertian NIR synthesis (material_lambertian.hpp)."""
    c = np.asarray(c, _f32).reshape(-1)
    if c.size == 4:
        return c.astype(_f32)
    if c.size == 1:
        c = np.repeat(c, 3)
    if nir is None:
        nir = float(np.mean(c[:3]))
    return np.array([c[0], c[1], c[2], nir], _f32)


# ---------------------------------------------------------------------------
# Textures (host descriptors)
# ---------------------------------------------------------------------------

@dataclass
class Texture:
    uv_scale: Tuple[float, float] = (1.0, 1.0)
    uv_offset: Tuple[float, float] = (0.0, 0.0)
    val_scale: Tuple[float, float, float, float] = (1.0, 1.0, 1.0, 1.0)
    val_offset: Tuple[float, float, float, float] = (0.0, 0.0, 0.0, 0.0)


@dataclass
class ConstantTexture(Texture):
    color: Sequence[float] = (1.0, 1.0, 1.0)


@dataclass
class CheckerTexture(Texture):
    color1: Sequence[float] = (0.0, 0.0, 0.0)
    color2: Sequence[float] = (1.0, 1.0, 1.0)
    squares: Tuple[int, int] = (8, 8)


@dataclass
class ImageTexture(Texture):
    image: np.ndarray = None     # [H, W, C] float (linear) or uint8
    srgb: bool = True            # uint8 inputs are sRGB-decoded at build time
    linear_filtering: bool = True


@dataclass
class NoiseTexture(Texture):
    kind: int = TextureType.PERLIN_NOISE
    octaves: int = 4
    frequency: float = 4.0
    gain: float = 0.5
    seed: int = 0
    # PERLIN only: emit |sum_i gain^i * perlin(2^i * f * uv)| — the
    # reference's TexturePerlinNoise::turbulence (texture_noise.hpp:239-251).
    # False = single signed Perlin octave (::value, texture_noise.hpp:192-237).
    turbulence: bool = False


# ---------------------------------------------------------------------------
# Materials (host descriptors)
# ---------------------------------------------------------------------------

TexOrColor = Union[Texture, Sequence[float], float, None]


@dataclass
class Material:
    normal_map: Optional[Texture] = None
    two_sided: bool = False


@dataclass
class Lambertian(Material):
    """Cosine-sampled diffuse (material_lambertian.hpp:35-120)."""
    albedo: TexOrColor = (0.5, 0.5, 0.5)


@dataclass
class GGX(Material):
    """Anisotropic GGX with VNDF sampling (material_ggx.hpp:36-278)."""
    albedo: TexOrColor = (1.0, 1.0, 1.0)   # used as F0
    roughness: Union[float, Tuple[float, float]] = 0.2


@dataclass
class Glass(Material):
    """Specular dielectric with per-channel IOR dispersion + Beer-Lambert
    absorption (material_glass.hpp:35-204)."""
    ior: Union[float, Sequence[float]] = 1.5
    absorption: Sequence[float] = (0.0, 0.0, 0.0, 0.0)

    @staticmethod
    def absorption_from_transparent_color(color, dist: float = 1.0) -> np.ndarray:
        """transparentColor -> absorption coefficients (material_glass.hpp:154-187)."""
        c = _vec4(color)
        c = np.clip(c, 1e-6, 1.0)
        return (-np.log(c) / dist).astype(_f32)


@dataclass
class Mirror(Material):
    """Perfect specular reflector (material_mirror.hpp:36-82)."""
    color: TexOrColor = (1.0, 1.0, 1.0)


@dataclass
class ModPhong(Material):
    """Energy-normalized modified Phong, the OBJ/MTL workhorse
    (material_modphong.hpp:35-357)."""
    diffuse: TexOrColor = (0.5, 0.5, 0.5)
    specular: TexOrColor = (0.0, 0.0, 0.0)
    shininess: float = 0.0
    opacity: TexOrColor = 1.0         # scalar, or a Texture sampled .r (map_d)
    emissive: TexOrColor = (0.0, 0.0, 0.0)
    ior: float = 1.0                  # pass-through refraction index
    transmissive: TexOrColor = (0.0, 0.0, 0.0)  # pass-through attenuation


@dataclass
class PhaseIso(Material):
    """Isotropic phase function for participating media
    (material_phase_function_isotropic.hpp)."""
    albedo: TexOrColor = (1.0, 1.0, 1.0)


@dataclass
class LightDiffuse(Material):
    """Diffuse area light (light_diffuse.hpp:33-76)."""
    radiance: TexOrColor = (1.0, 1.0, 1.0)


@dataclass
class LightSpot(Material):
    """Spot light with opening angle (light_spot.hpp:32-75)."""
    radiance: TexOrColor = (1.0, 1.0, 1.0)
    half_angle: float = np.deg2rad(22.5)


@dataclass
class LightTof(Material):
    """NIR-only ToF illumination unit (light_tof.hpp:37-89)."""
    radiance_w: float = 1.0
    half_angle: float = np.deg2rad(22.5)


@dataclass
class RGLMaterial(Material):
    """Measured RGL BRDF (material_rgl.hpp); tables registered separately."""
    table_name: str = ""


# ---------------------------------------------------------------------------
# Geometry (host)
# ---------------------------------------------------------------------------

@dataclass
class Mesh:
    """Indexed triangle mesh, SoA like the reference's construction inputs
    (``mesh.hpp:74-153``); the interleaved buffer is a CPU-cache detail we drop."""
    positions: np.ndarray                 # [V, 3]
    normals: Optional[np.ndarray] = None  # [V, 3]
    texcoords: Optional[np.ndarray] = None  # [V, 2]
    tangents: Optional[np.ndarray] = None   # [V, 3]
    indices: np.ndarray = None            # [F, 3] int

    def __post_init__(self):
        self.positions = np.asarray(self.positions, _f32).reshape(-1, 3)
        if self.indices is None:
            self.indices = np.arange(len(self.positions), dtype=np.int32).reshape(-1, 3)
        self.indices = np.asarray(self.indices, np.int32).reshape(-1, 3)
        if self.normals is not None:
            self.normals = np.asarray(self.normals, _f32).reshape(-1, 3)
        if self.texcoords is not None:
            self.texcoords = np.asarray(self.texcoords, _f32).reshape(-1, 2)
        if self.tangents is not None:
            self.tangents = np.asarray(self.tangents, _f32).reshape(-1, 3)


@dataclass
class MeshInstance:
    mesh: Mesh
    material: Union[Material, int, str]
    transformation: Optional[Transformation] = None
    animation: Optional[int] = None   # animation id returned by scene.take_animation


@dataclass
class SphereObject:
    center: Sequence[float]
    radius: float
    material: Union[Material, int, str]
    transformation: Optional[Transformation] = None
    animation: Optional[int] = None


@dataclass
class MediumObject:
    """Homogeneous medium inside a boundary (hitable_medium.hpp:38-99)."""
    boundary: Union[MeshInstance, SphereObject]
    density: float = 1.0
    phase: Material = None


# ---------------------------------------------------------------------------
# Environment map host descriptors
# ---------------------------------------------------------------------------

@dataclass
class EnvironmentMapEquiRect:
    image: np.ndarray                  # [H, W, 3|4] float, linear radiance
    importance_resolution: int = 0     # 0 = no importance sampling
    x_convention_surround: bool = False  # envmap.hpp:213-248 x-axis convention
    rotation: Optional[np.ndarray] = None


@dataclass
class EnvironmentMapCube:
    """Cube map faces: dict/list [+x,-x,+y,-y,+z,-z] each [H,W,3|4]."""
    faces: Sequence[np.ndarray]
    importance_resolution: int = 0
    rotation: Optional[np.ndarray] = None


@dataclass
class EnvironmentMapConstant:
    radiance: Sequence[float] = (1.0, 1.0, 1.0)


# ---------------------------------------------------------------------------
# Animation host descriptor
# ---------------------------------------------------------------------------

@dataclass
class AnimationKeyframes:
    """Sorted (time, Transformation) keyframes (animation_keyframes.hpp:51-216)."""
    times: Sequence[float]
    transformations: Sequence[Transformation]


# ---------------------------------------------------------------------------
# Scene
# ---------------------------------------------------------------------------

HOT_SPOT = True
COLD_SPOT = False


class Scene:
    """Collects content, then `build()` flattens to `SceneArrays`.

    Usage parallels the reference apps (e.g. ``wurblpt-cornellbox.cpp:43-49``)::

        scene = Scene()
        m = scene.take_material(Lambertian(albedo=(0.7, 0.7, 0.7)))
        scene.take_mesh_instance(MeshInstance(mesh, m), hot_spot=False)
        arrays = scene.build()
    """

    def __init__(self):
        self._materials: List[Material] = []
        self._material_names = {}
        self._instances: List[Tuple[MeshInstance, bool]] = []
        self._spheres: List[Tuple[SphereObject, bool]] = []
        self._media: List[MediumObject] = []
        self._animations: List[AnimationKeyframes] = [None]  # id 0 = identity
        self._envmap = None
        self._rgl_tables = {}

    # -- take() family ------------------------------------------------------

    def take_material(self, material: Material, name: Optional[str] = None) -> int:
        idx = len(self._materials)
        self._materials.append(material)
        if name is not None:
            self._material_names[name] = idx
        return idx

    def material_index(self, name: str) -> int:
        return self._material_names[name]

    def take_animation(self, anim: AnimationKeyframes) -> int:
        idx = len(self._animations)
        self._animations.append(anim)
        return idx

    def take_mesh_instance(self, inst: MeshInstance, hot_spot: bool = False) -> None:
        self._instances.append((inst, hot_spot))

    def take_sphere(self, sph: SphereObject, hot_spot: bool = False) -> None:
        self._spheres.append((sph, hot_spot))

    def take_medium(self, medium: MediumObject) -> None:
        self._media.append(medium)

    def take_rgl_table(self, name: str, source) -> None:
        """Register a measured RGL BRDF dataset under `name` so RGLMaterial
        instances can reference it (MaterialRGL ctor, material_rgl.hpp:57-59).

        source: path to a .bsdf tensor_file, a parsed field dict, or an
        already-loaded table dict from materials.rgl.load_rgl_material."""
        from ..materials.rgl import load_rgl_material

        if isinstance(source, dict) and "vndf_data" in source:
            self._rgl_tables[name] = source
        else:
            self._rgl_tables[name] = load_rgl_material(source)

    def set_environment_map(self, env) -> None:
        self._envmap = env

    # -- build --------------------------------------------------------------

    def _resolve_material(self, m) -> int:
        if isinstance(m, int):
            return m
        if isinstance(m, str):
            return self._material_names[m]
        # Inline Material object: register on first resolve, reuse after
        # (resolution must be idempotent — flatten resolves twice).
        key = id(m)
        cache = getattr(self, "_inline_material_ids", None)
        if cache is None:
            cache = self._inline_material_ids = {}
        if key not in cache:
            cache[key] = self.take_material(m)
        return cache[key]

    def build(self, max_image_dim: int = 2048, use_bvh=None,
              t0: float = 0.0, t1: float = 0.0,
              light_sampling: str = "power") -> SceneArrays:
        """Flatten to SceneArrays. `use_bvh`: None = auto (prim-count
        threshold), True/False = force; the BVH is the threaded SAH tree of
        :mod:`wurblpt_tpu.accel` (reference ``Scene::updateBVH``,
        scene.hpp:151-169). [t0, t1] is the render time interval: animated
        prims get conservative swept AABBs over it, like the reference's
        ``updateBVH(t0, t1)``. `light_sampling`: "power" (default) attaches
        the power-proportional pick tables; "uniform" restores the
        reference's uniform hot-spot pick (wurblpt.hpp:187)."""
        from .flatten import flatten_scene

        return flatten_scene(self, max_image_dim=max_image_dim, use_bvh=use_bvh,
                             t0=t0, t1=t1, light_sampling=light_sampling)
