"""Data: image dataset, host batching, layout conversion."""

from rectified_flow_vision_tpu.data.dataset import (  # noqa: F401
    ArrayDataset,
    ImageDataset,
    as_nchw,
    as_nhwc,
    eval_reference_images,
    list_image_paths,
    load_image,
)
from rectified_flow_vision_tpu.data.packed import (  # noqa: F401
    PackedCorpus,
    pack_corpus,
)
