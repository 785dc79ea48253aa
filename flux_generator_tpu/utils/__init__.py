from .audio import save_audio
from .images import save_image_grid, to_pil
