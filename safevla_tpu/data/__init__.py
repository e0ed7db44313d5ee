from safevla_tpu.data.stores import (
    LazyJsonDataset,
    LazyJsonHouses,
    LazyJsonTaskSpecs,
    Hdf5TaskSpecs,
    DatasetDict,
    load_dataset_from_path,
    read_jsonlgz,
)

__all__ = [
    "LazyJsonDataset",
    "LazyJsonHouses",
    "LazyJsonTaskSpecs",
    "Hdf5TaskSpecs",
    "DatasetDict",
    "load_dataset_from_path",
    "read_jsonlgz",
]
