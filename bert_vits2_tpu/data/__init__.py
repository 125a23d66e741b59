"""Host-side data pipeline: filelist dataset, bucketed sampler, static-shape
collation (reference: data_utils.py). Everything here is numpy/CPU; device
placement happens in the train loop via parallel.shard_batch.
"""

from bert_vits2_tpu.data.dataset import FilelistDataset, Utterance
from bert_vits2_tpu.data.sampler import BucketSampler
from bert_vits2_tpu.data.collate import collate_batch, bucket_shape

__all__ = [
    "FilelistDataset",
    "Utterance",
    "BucketSampler",
    "collate_batch",
    "bucket_shape",
]
