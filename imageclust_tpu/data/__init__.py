from imageclust_tpu.data.loader import decode_images, load_image_dir, sanitize_filename

__all__ = ["decode_images", "load_image_dir", "sanitize_filename"]
