"""cara_tpu — TPU-native CaRA (Canonical Rank Adaptation) framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of BonnBytes/CaRA
(ICML 2025 PEFT method for Vision Transformers): CP-decomposed global adapter
tensors over a frozen ViT backbone, the VTAB-1k/FGVC fine-tuning pipeline,
fused TPU kernels, sharded data-parallel training over a device mesh, and a
merged-weight inference path.
"""

__version__ = "0.1.0"

from cara_tpu.config import CaraConfig, ViTConfig, get_model_config  # noqa: F401
