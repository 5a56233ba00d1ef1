from .safetensors_io import LazySafetensors, load_file, safe_open_header, save_file
