"""flux_generator_tpu — a TPU-native JAX generative-media framework.

Capabilities mirror voipnuggets/flux-generator (see SURVEY.md): Flux schnell/dev
rectified-flow MMDiT, Stable Diffusion 2.1, SDXL-Turbo, and MusicGen-medium,
served via an A1111-compatible REST API, a web UI, CLI tools, and DreamBooth
LoRA fine-tuning — rebuilt TPU-first on jitted JAX, Pallas kernels, and GSPMD
sharding rather than a port of the reference's MLX/Metal substrate.
"""

__version__ = "0.1.0"
