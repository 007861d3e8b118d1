"""Framework-wide constants (reference: oar-ocr-core/src/core/constants.rs:8-33)."""

# Recognizer canonical input shape [C, H, W] (constants.rs:21).
REC_IMAGE_SHAPE = (3, 48, 320)
# Max recognizer input width after ratio padding (constants.rs:8).
REC_MAX_WIDTH = 3200
# Detector defaults (constants.rs:15,11).
DET_LIMIT_SIDE_LEN = 960
DET_MAX_SIDE_LEN = 4000
# Default adapter batch size (adapter.rs:109-111).
DEFAULT_BATCH_SIZE = 6
# Cross-image crop pool flush threshold and hard cap (src/oarocr/ocr.rs:603,:93).
MAX_POOLED_CROPS = 4096
MAX_BATCH_SIZE = 4096
# Sanity cap on a single tensor's element count (constants.rs MAX_TENSOR_SIZE).
MAX_TENSOR_SIZE = 100_000_000

# ImageNet normalization (used by DB det, PP-LCNet; normalization.rs:18-26).
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)
