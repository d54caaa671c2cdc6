"""nerf_tpu — a TPU-native Neural Radiance Field framework in JAX.

Built from scratch with the capabilities of the reference PyTorch package
``brandontrabucco/nerf`` (see SURVEY.md): both the v1.2 "classic NeRF"
generation (``ClassicNeRF``) and the HEAD mip-NeRF/segmentation generation
(``MipNeRF``), plus hierarchical sampling, latent conditioning, device-mesh
data parallelism, fused Pallas kernels, checkpointing and a training stack
that the reference never had.
"""

from nerf_tpu.config import (
    ClassicNeRFConfig,
    MeshConfig,
    MipNeRFConfig,
    RenderConfig,
    TrainConfig,
)
from nerf_tpu.models.nerf import ClassicNeRF, MipNeRF, RenderOutput

__version__ = "0.1.0"

__all__ = [
    "ClassicNeRF",
    "ClassicNeRFConfig",
    "MeshConfig",
    "MipNeRF",
    "MipNeRFConfig",
    "RenderConfig",
    "RenderOutput",
    "TrainConfig",
]
