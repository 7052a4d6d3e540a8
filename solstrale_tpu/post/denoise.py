"""Denoiser post processor with the OIDN interface semantics
(``/root/reference/src/post/oidn.rs``): final-only (oidn.rs:66-78), consumes
albedo+normal aux channels, operates on tone-mapped sRGB floats
(oidn.rs:131-138), outputs u8.
"""
from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from ..models.denoiser import DenoiserCNN, denoise_bilateral
from ..utils import to_float
from . import PostProcessor


_BUNDLED_WEIGHTS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "models", "denoiser_weights.pkl")


class DenoiserPostProcessor(PostProcessor):
    def __init__(self, weights_path=None, use_cnn=True):
        if weights_path is None and use_cnn and \
                os.path.exists(_BUNDLED_WEIGHTS):
            weights_path = _BUNDLED_WEIGHTS
        self.weights_path = weights_path
        self._params = None
        if weights_path and os.path.exists(weights_path):
            import pickle

            with open(weights_path, "rb") as f:
                self._params = pickle.load(f)

    def needs_albedo_and_normal_colors(self):
        return True

    def intermediate_post_process(self, *args, **kwargs):
        # oidn.rs:66-78: cannot be an intermediate processor
        raise ValueError(
            "DenoiserPostProcessor can not be used as an intermediate post processor")

    def post_process(self, pixel_sums, albedo_sums, normal_sums, width,
                     height, num_samples):
        color = to_float(jnp.asarray(pixel_sums, jnp.float32), num_samples)
        albedo = to_float(jnp.asarray(albedo_sums, jnp.float32), num_samples)
        normal = jnp.asarray(normal_sums, jnp.float32) / num_samples
        if self._params is not None and DenoiserCNN is not None:
            model = DenoiserCNN()
            out = model.apply(self._params, color, albedo, normal)
        else:
            out = denoise_bilateral(color, albedo, normal)
        out = jnp.clip(out, 0.0, 0.999)
        return np.asarray(jnp.clip(jnp.floor(256.0 * out), 0, 255)
                          .astype(jnp.uint8))


class OidnPostProcessor(DenoiserPostProcessor):
    """Name-parity alias for users porting from the reference
    (post/oidn.rs:19-83); runs the learned/bilateral denoiser instead of the
    Intel OIDN C++ library."""
