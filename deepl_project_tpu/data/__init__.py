from .datasets import (coco_dataset, hf_streaming_dataset, image_folder_dataset,
                       make_dataset, synthetic_dataset,
                       synthetic_shapes_dataset)
from .pipeline import batch_iterator, input_pipeline, prefetch_to_device
from .transforms import (center_crop, preprocess_file, preprocess_image,
                         resize_shorter_side, to_array)

__all__ = [
    "synthetic_dataset", "image_folder_dataset", "coco_dataset",
    "hf_streaming_dataset", "make_dataset", "synthetic_shapes_dataset",
    "batch_iterator", "prefetch_to_device", "input_pipeline",
    "preprocess_image", "preprocess_file", "resize_shorter_side",
    "center_crop", "to_array",
]
