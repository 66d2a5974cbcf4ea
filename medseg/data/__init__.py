from medseg.data.nifti import NiftiImage, read_nifti, write_nifti
from medseg.data.dataset import (
    load_decathlon_datalist,
    kfold_split,
    partition_dataset_indices,
    CrossValidationFolds,
    DecathlonDataset,
    ListDataset,
    CacheDataset,
)
from medseg.data.loader import DataLoader
from medseg.data import transforms

__all__ = [
    "NiftiImage",
    "read_nifti",
    "write_nifti",
    "load_decathlon_datalist",
    "kfold_split",
    "partition_dataset_indices",
    "CrossValidationFolds",
    "DecathlonDataset",
    "ListDataset",
    "CacheDataset",
    "DataLoader",
    "transforms",
]
