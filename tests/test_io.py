"""io.read_corpus format dispatch: the north-star corpus is a Lance table
(input_hint), the sandbox fixtures are parquet.  The lance package is not
installed here, so the Lance branch's pinnable surface is the dispatch
predicate and the error contract; the parquet branch is exercised by every
pipeline test."""

import os

import pytest

from deduplicator_ray import io as dio


def test_is_lance_dataset(tmp_path):
    assert dio.is_lance_dataset("/data/corpus.lance")
    assert dio.is_lance_dataset(str(tmp_path) + "/x.lance/")
    d = tmp_path / "ds"
    (d / "_versions").mkdir(parents=True)
    assert dio.is_lance_dataset(str(d))
    assert not dio.is_lance_dataset(str(tmp_path))
    assert not dio.is_lance_dataset("/data/shards")


def test_read_corpus_lance_gate(tmp_path):
    d = tmp_path / "corpus.lance"
    os.makedirs(d / "_versions")
    with pytest.raises(ImportError, match="lance"):
        dio.read_corpus(str(d))


def test_read_corpus_parquet_branch(sf_small):
    from deduplicator_ray import fixtures

    ds = dio.read_corpus(fixtures.images_path(sf_small),
                         columns=["image_id"])
    assert ds.count() > 0
    assert ds.schema().names == ["image_id"]
