"""io.read_corpus format dispatch: the north-star corpus is a Lance table
(input_hint), the sandbox fixtures are parquet.  The lance package is not
installed here, so the Lance branch's pinnable surface is the dispatch
predicate and the error contract; the parquet branch is exercised by every
pipeline test."""

import os

import pyarrow as pa
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


def test_read_image_files_matches_parquet_pipeline(sf_small, tmp_path):
    """S1 glob source round-trip: export the fixture corpus as REAL files
    in a directory tree, re-ingest with read_image_files, and the
    reference-mode clusters AND decisions must equal the parquet-table
    pipeline on the same rows.  raw is excluded (headerless — dims live in
    the table, not the payload; file ingest routes it to the md5 path by
    design)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from deduplicator_ray import fixtures
    from deduplicator_ray.config import PipelineConfig
    from deduplicator_ray.pipelines import image_dedup as ip

    cfg = PipelineConfig()
    src = pq.read_table(fixtures.images_path(sf_small, cfg.hash_size))
    src = src.filter(pc.invert(pc.equal(src["fmt"], "raw")))
    root = tmp_path / "tree"
    for iid, data in zip(src["image_id"].to_pylist(),
                         src["bytes"].to_pylist()):
        p = root / iid
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_bytes(data)

    files_ds = dio.read_image_files(str(root))
    assert files_ds.schema().names == ["image_id", "bytes", "w", "h",
                                       "fmt", "caption", "phash"]

    import ray.data as rd

    table_ds = rd.from_arrow(src)

    def _clusters(ds):
        return (ip.reference_clusters(ds, cfg).to_pandas()
                [["proc_hash", "image_id"]]
                .sort_values(["proc_hash", "image_id"])
                .reset_index(drop=True))

    import pandas as pd

    pd.testing.assert_frame_equal(_clusters(files_ds), _clusters(table_ds))

    def _decisions(ds):
        out = ip.reference_decisions(ds, cfg).to_pandas()
        return out.sort_values(["cluster_id", "image_id"]).reset_index(drop=True)

    pd.testing.assert_frame_equal(_decisions(files_ds), _decisions(table_ds))
    assert len(_clusters(files_ds)) > 0


def test_captionless_corpus_does_not_megacluster(sf_small, tmp_path):
    """Empty caption = NO caption: the caption channel must be inert for it
    (banding emits no cap rows, the oracle skips the Jaccard check), or a
    file-ingested corpus — captions are all '' — collapses into one
    Jaccard-1.0 mega-cluster.  Extended clusters over the captionless
    corpus must equal the image-channel truth: the oracle's verified pairs
    recomputed WITH captions blanked."""
    import pandas as pd
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray.data as rd

    from deduplicator_ray import fixtures, oracle
    from deduplicator_ray.config import PipelineConfig
    from deduplicator_ray.pipelines import image_dedup as ip

    cfg = PipelineConfig()
    src = pq.read_table(fixtures.images_path(sf_small, cfg.hash_size))
    blank = pa.array([""] * src.num_rows, pa.string())
    src = src.set_column(src.schema.get_field_index("caption"), "caption",
                         blank)

    eng = (ip.extended_clusters(rd.from_arrow(src), cfg).to_pandas()
           .sort_values("image_id").reset_index(drop=True))

    rows = oracle.compute_rows(src, cfg)
    want_pairs = oracle.verified_pairs(rows, cfg)
    want = oracle.connected_components(want_pairs)
    got_assign = dict(zip(eng["image_id"], eng["cluster_id"]))
    assert got_assign == want
    # sanity: far from one mega-cluster — many distinct components
    assert eng["cluster_id"].nunique() > 10


def test_read_documents_format_dispatch(tmp_path):
    """JSONL and CSV ingest must yield the same rows as the parquet read
    (modulo CSV's lossy typing, pinned here to int64/string columns), and
    the column projection must apply on all three paths."""
    import json

    import pyarrow as pa
    import pyarrow.parquet as pq

    from deduplicator_ray import io as dio

    rows = [{"doc_id": i, "text": f"text {i}", "lang": "en"}
            for i in range(7)]
    pq_path = str(tmp_path / "documents.parquet")
    pq.write_table(pa.Table.from_pylist(rows), pq_path)
    jl_path = str(tmp_path / "documents.jsonl")
    with open(jl_path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    csv_path = str(tmp_path / "documents.csv")
    with open(csv_path, "w") as f:
        f.write("doc_id,text,lang\n")
        for r in rows:
            f.write(f"{r['doc_id']},{r['text']},{r['lang']}\n")

    base = (dio.read_documents(pq_path, columns=["doc_id", "text"])
            .to_pandas().sort_values("doc_id").reset_index(drop=True))
    for p in (jl_path, csv_path):
        got = (dio.read_documents(p, columns=["doc_id", "text"])
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        got["doc_id"] = got["doc_id"].astype("int64")
        assert got.equals(base), p
    assert list(base.columns) == ["doc_id", "text"]
