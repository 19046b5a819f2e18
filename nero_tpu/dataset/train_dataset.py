"""Dataset registry (schema parity: reference dataset/train_dataset.py,
name2dataset.py, utils/dataset_utils.py).

The reference's DataLoader only drives the step loop with empty dicts — the
real data lives inside the renderer (SURVEY.md §1 "data pipeline bypasses the
DataLoader"). In nero_tpu the step loop is the trainer itself and batches are
sampled on device, so `DummyDataset` exists purely to honour the YAML keys
`train_dataset_type: dummy` / `val_set_list` and to size validation loops.
"""
from __future__ import annotations


class DummyDataset:
    """Yields step/validation indices; no payload."""

    def __init__(self, cfg: dict, is_train: bool):
        self.cfg = cfg
        self.is_train = is_train

    def __len__(self):
        if self.is_train:
            return 999999999
        from nero_tpu.dataset.database import get_database_split, parse_database_name
        database = parse_database_name(self.cfg["database_name"])
        _, test_ids = get_database_split(database)
        return len(test_ids)

    def __getitem__(self, index):
        return {"index": index}

    def reset(self):
        pass


def dummy_collate_fn(data_list):
    return data_list[0]


name2dataset = {
    "dummy": DummyDataset,
}
