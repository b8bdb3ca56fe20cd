"""coolchic_tpu: a TPU-native overfitted neural image & video codec.

JAX/XLA/Pallas compute path + C++ host-side entropy coding, with the
capabilities and bitstream format of Cool-Chic 5.0.1.
"""

import os

import jax

__version__ = "0.1.0"

# The codec's float path (synthesis / upsampling convs, ARM matmuls) targets
# 35-45 dB PSNR reconstructions; TPU's default bf16 matmul inputs cost >1 dB.
# Pin full-f32 accumulation unless the user explicitly opts out.
if os.environ.get("COOLCHIC_TPU_MATMUL_PRECISION", "highest") != "default":
    jax.config.update(
        "jax_default_matmul_precision",
        os.environ.get("COOLCHIC_TPU_MATMUL_PRECISION", "highest"),
    )
