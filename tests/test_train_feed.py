"""Deterministic shuffled-epoch feed (pipelines/train_feed.py)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from simple_content_ocr_ray.pipelines import train_feed

SF = "/root/testdata/sf0.001"


def test_epoch_covers_corpus_exactly_once(ray_session):
    order = train_feed.epoch_doc_order(SF, epoch=0)
    exp = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"])[
        "doc_id"
    ].to_numpy()
    assert np.array_equal(np.sort(order), np.sort(exp))


def test_same_epoch_same_order(ray_session):
    a = train_feed.epoch_doc_order(SF, epoch=3)
    b = train_feed.epoch_doc_order(SF, epoch=3)
    assert np.array_equal(a, b)


def test_different_epochs_differ_and_shuffle(ray_session):
    a = train_feed.epoch_doc_order(SF, epoch=0)
    b = train_feed.epoch_doc_order(SF, epoch=1)
    assert not np.array_equal(a, b)
    # actually shuffled, not the sorted on-disk order
    assert not np.array_equal(a, np.sort(a))


def test_batch_size_respected(ray_session):
    sizes = [len(b) for b in train_feed.epoch_batches(SF, epoch=0, batch_size=64)]
    assert all(s <= 64 for s in sizes)
    assert sum(sizes) == 500
