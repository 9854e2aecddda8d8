from .base import ReIDDataset, Record, imagedata_info
from .datasets import (
    AGReIDv2,
    DATASET_REGISTRY,
    DukeMTMCreID,
    G2APS,
    MMMP,
    MSMT17,
    Market1501,
    OccDukeMTMCreID,
    RegDB,
    SYSU,
    VeRi,
    VehicleID,
    build_dataset,
)
from .loader import ImageBatcher, ShuffledLoader, TrainLoader, decode_resize, make_dataloader
from .sampler import RandomIdentitySampler, shard_for_host
