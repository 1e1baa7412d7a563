from streamingt2v_tpu.data.datasets import (  # noqa: F401
    ImageFolderDataset,
    SingleImageDataset,
    SyntheticVideoDataset,
    batch_iterator,
)
