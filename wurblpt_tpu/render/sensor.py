"""Sensors: pluggable radiance accumulators.

Reference interface: ``Sensor::accumulateRadiance(ray, pathComponent,
geomPathLength, opticalPathLength, distanceToLight, radiance, hit, t0, t1, acc)``
plus ``finishPixel`` (``sensor.hpp:36-84``, max 3 accumulator components). Here a
sensor is a static Python object whose `accumulate` folds an *event* into a
per-ray accumulator inside the jitted wavefront loop, and whose `finish`
converts the summed accumulator image.

Implemented sensors:
* SensorRGB     — RGB accumulation with optical-path-length and
                  distance-to-light windows for light-in-flight imaging
                  (sensor_rgb.hpp:33-100).
* SensorTofAmcw — amplitude-modulated continuous-wave ToF simulation
                  (sensor_tof_amcw.hpp:52-265): phase correlation buckets from
                  the per-path *optical* path length (NIR channel), electron
                  conversion with shot noise and saturation, and 4-phase
                  distance/amplitude/intensity reconstruction.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from ..core.constants import SPEED_OF_LIGHT
from ..core.rng import hash4


class SensorEvent(NamedTuple):
    """One radiance deposit along a path (argument set of accumulateRadiance)."""

    radiance: jnp.ndarray           # [N, 4] throughput-weighted RGB+NIR
    path_component: jnp.ndarray     # [N] int32 bounce index
    geom_path_length: jnp.ndarray   # [N] meters from camera along the path
    optical_path_length: jnp.ndarray  # [N, 4] refractive-index-weighted length
    distance_to_light: jnp.ndarray  # [N] last-segment length for NEE events (else 0)
    active: jnp.ndarray             # [N] bool: lanes that deposit


@dataclass(frozen=True)
class SensorRGB:
    """RGB sensor; optional [min,max] windows on optical path length and
    distance-to-light enable light-in-flight slicing (sensor_rgb.hpp:63-80)."""

    opl_min: float = 0.0
    opl_max: float = float("inf")
    dtl_min: float = 0.0
    dtl_max: float = float("inf")

    n_acc: int = 3

    def accumulate(self, acc, ev: SensorEvent):
        opl = ev.optical_path_length[..., 0]  # R channel drives the window
        ok = (
            ev.active
            & (opl >= self.opl_min)
            & (opl <= self.opl_max)
            & (ev.distance_to_light >= self.dtl_min)
            & (ev.distance_to_light <= self.dtl_max)
        )
        return acc + jnp.where(ok[..., None], ev.radiance[..., :3], 0.0)

    def finish(self, acc_image, inv_samples):
        return acc_image * inv_samples


@dataclass(frozen=True)
class SensorTofAmcw:
    """AMCW ToF sensor (IEEE Sensors 2015 model; sensor_tof_amcw.hpp).

    Renders one *phase image* per `mcpt` call: the accumulator holds the two
    correlation buckets (a, b) plus plain NIR intensity. The phase shift is
    phi = 2 pi * opticalPathLength.w * f_mod / c  (sensor_tof_amcw.hpp:243-251),
    tau_i = i * pi/2 for phase index i in 0..3.
    """

    modulation_frequency: float = 20e6
    phase_index: int = 0
    contrast: float = 0.75
    # Timing model (sensor_tof_amcw.hpp:117-138)
    fps: float = 30.0
    exposure_time: float = 1e-3          # seconds per phase image
    readout_time: float = 1e-3
    pause_time: float = 0.0
    duty_cycle: float = 0.5
    # Radiometric conversion
    pixel_area: float = (12e-6) ** 2     # m^2
    aperture_factor: float = 1.0         # lumped lens/solid-angle factor
    quantum_efficiency: float = 0.8
    energy_per_electron: float = 1.3e-19 # J at ~850nm (h*c/lambda)
    max_electrons: float = 100000.0

    n_acc: int = 3

    # -- per-frame timing helpers (host) ------------------------------------
    def phase_image_duration(self) -> float:
        return self.exposure_time + self.readout_time

    def frame_duration(self) -> float:
        return 1.0 / self.fps

    def phase_start_time(self, i: int) -> float:
        return i * self.phase_image_duration()

    # -- device accumulation -------------------------------------------------
    def accumulate(self, acc, ev: SensorEvent):
        # NIR irradiance -> power -> energy (sensor_tof_amcw.hpp:238-241).
        irradiance = ev.radiance[..., 3]
        power = irradiance * self.pixel_area * self.aperture_factor
        energy = power * self.exposure_time * self.duty_cycle
        phi = (
            2.0
            * jnp.pi
            * ev.optical_path_length[..., 3]
            * (self.modulation_frequency / SPEED_OF_LIGHT)
        )
        tau = self.phase_index * (jnp.pi / 2.0)
        a = 0.5 * energy * (1.0 + self.contrast * jnp.cos(tau + phi))
        b = 0.5 * energy * (1.0 - self.contrast * jnp.cos(tau + phi))
        dep = jnp.stack([a, b, energy], axis=-1)
        return acc + jnp.where(ev.active[..., None], dep, 0.0)

    def finish(self, acc_image, inv_samples):
        return acc_image * inv_samples

    # -- post-processing (host/jnp) ------------------------------------------
    def phase(self, acc_image, shot_noise_factor: float = 0.0, seed: int = 0):
        """Energy buckets -> electron counts with shot noise + saturation
        (sensor_tof_amcw.hpp:147-169). Returns [H, W, 3] (a_e, b_e, intensity_e)."""
        electrons = (
            acc_image * (self.quantum_efficiency / self.energy_per_electron)
        )
        if shot_noise_factor > 0.0:
            h, w = electrons.shape[0], electrons.shape[1]
            yy = jnp.arange(h, dtype=jnp.int32)[:, None] * jnp.ones((1, w), jnp.int32)
            xx = jnp.arange(w, dtype=jnp.int32)[None, :] * jnp.ones((h, 1), jnp.int32)
            out = []
            for c in range(electrons.shape[-1]):
                v0, v1, _, _ = hash4(yy * w + xx, c, seed, 0xBEEF)
                # Box-Muller standard normal
                u1 = (v0 >> 8).astype(jnp.float32) * (1.0 / 16777216.0)
                u2 = (v1 >> 8).astype(jnp.float32) * (1.0 / 16777216.0)
                g = jnp.sqrt(-2.0 * jnp.log(jnp.maximum(u1, 1e-12))) * jnp.cos(
                    2.0 * jnp.pi * u2
                )
                e = electrons[..., c]
                noisy = e + g * jnp.sqrt(jnp.maximum(e, 0.0)) * shot_noise_factor
                out.append(noisy)
            electrons = jnp.stack(out, axis=-1)
        return jnp.clip(electrons, 0.0, self.max_electrons)

    def result(self, phases):
        """4 phase images -> (distance, amplitude, intensity)
        (sensor_tof_amcw.hpp:171-213). `phases`: list of 4 [H, W, 3] arrays
        (a, b, intensity electrons) for phase indices 0..3."""
        d = [p[..., 0] - p[..., 1] for p in phases]  # a-b per phase image
        # I/Q demodulation: phase = atan2(d3 - d1, d0 - d2)
        q = d[3] - d[1]
        i = d[0] - d[2]
        phi = jnp.arctan2(q, i)
        phi = jnp.where(phi < 0.0, phi + 2.0 * jnp.pi, phi)
        distance = (
            phi * SPEED_OF_LIGHT / (4.0 * jnp.pi * self.modulation_frequency)
        )
        amplitude = 0.5 * jnp.sqrt(i * i + q * q) / max(self.contrast, 1e-6)
        intensity = 0.25 * sum(p[..., 2] for p in phases)
        return distance, amplitude, intensity
