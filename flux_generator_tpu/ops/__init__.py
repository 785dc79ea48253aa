from .linear import dense, conv2d, conv1d, conv_transpose1d, init_dense, init_conv2d
from .norms import layer_norm, rms_norm, group_norm
from .rope import rope_cos_sin, apply_rope, multi_axis_rope
from .embeddings import timestep_embedding, sinusoidal_positions
from .attention import dot_product_attention
