"""Learned models used inside the differentiable render graph."""
from .denoiser import DenoiserCNN, denoise_bilateral  # noqa: F401
