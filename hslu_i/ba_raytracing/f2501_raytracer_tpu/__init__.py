"""TPU-native Whitted raytracing framework.

A from-scratch JAX/XLA/Pallas re-architecture of the capabilities of
kije/HSLU_I.BA_RAYTRACING.F2501_raytracer (a nightly-Rust SIMD+rayon CPU
raytracer, mounted read-only at /root/reference for parity auditing).

Architecture mapping (see SURVEY.md §7):
  SIMD lanes + masks      -> dense ray wavefronts + boolean arrays
  Splat/GeometryCollection-> SoA scene arrays in HBM (scene/device.py)
  recursion tree + threads-> masked DFS wavefront loop (ops/trace.py)
  Cramer 3x3 per ray/tri  -> Woop transforms as MXU matmuls (ops/intersect.py)
  rayon tile scheduler    -> jitted ray-wavefront tiles (renderer.py)
  cargo feature flags     -> jit-static RenderConfig (config.py)
  AtomicU32 framebuffer   -> host ImageBuffer + progressive commits
  threads across an image -> jax.sharding mesh over the pixel plane (parallel/)
"""

from .config import (
    DEFAULT_REFRACTION_INDEX,
    RESOLUTION_HIGH,
    RESOLUTION_MEDIUM,
    RESOLUTION_SMALL,
    CameraSpec,
    RenderConfig,
)
from .framebuffer import ImageBuffer
from .materials import Material, TransmissionProperties
from .renderer import RaytracerRenderer
from .scene.builder import (
    BoundedPlane,
    GeometryCollection,
    Isometry3,
    Scene,
    Similarity3,
    SphereData,
    TriangleData,
    rotor3_from_euler_angles,
)
from .scene.device import DeviceScene, build_device_scene
from .scene.lighting import AmbientLight, PointLight, SceneLightSource
from .tune import TuneResult, autotune

__all__ = [
    "AmbientLight",
    "BoundedPlane",
    "CameraSpec",
    "DEFAULT_REFRACTION_INDEX",
    "DeviceScene",
    "GeometryCollection",
    "ImageBuffer",
    "Isometry3",
    "Material",
    "PointLight",
    "RESOLUTION_HIGH",
    "RESOLUTION_MEDIUM",
    "RESOLUTION_SMALL",
    "RaytracerRenderer",
    "RenderConfig",
    "Scene",
    "SceneLightSource",
    "Similarity3",
    "SphereData",
    "TransmissionProperties",
    "TriangleData",
    "TuneResult",
    "autotune",
    "build_device_scene",
    "rotor3_from_euler_angles",
]

__version__ = "0.1.0"
