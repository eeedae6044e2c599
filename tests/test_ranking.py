import numpy as np

from deduplicator_ray.stages import ranking


def test_image_tuple_ordering():
    # higher pixels wins, then filesize, then density
    a = ranking.image_sort_tuple(1, 100, 50)
    b = ranking.image_sort_tuple(1, 200, 10)
    assert b < a  # more pixels is better (sorts first)
    c = ranking.image_sort_tuple(2, 100, 50)
    assert c < a  # more frames is better


def test_name_tuple_hand_computed():
    # 36-hex name is penalized (dedupc.py:83)
    hexname = "0" * 36 + ".png"
    t_hex = ranking.name_sort_tuple(f"d/{hexname}")
    t_plain = ranking.name_sort_tuple("d/photo-of_cat.png")
    assert t_hex[0] == 1 and t_plain[0] == 0
    # punctuation count: '-' and '_' in "photo-of_cat.png" → 2 → -2
    assert t_plain[3] == -2
    # series suffix " (2)." flagged (dedupc.py:87)
    t_series = ranking.name_sort_tuple("d/photo (2).png")
    assert t_series[4] == 1
    assert t_plain < t_hex


def test_dir_tuple_words_and_quirk():
    t = ranking.dir_sort_tuple("best/original/x.png", good_words=("best", "original"))
    assert t[0] == -2
    t2 = ranking.dir_sort_tuple("temp/cache/x.png", bad_words=("temp", "cache"))
    assert t2[1] == 2
    # reference quirk: no separator → len(x)-1 (x[:x.rfind(sep)])
    t3 = ranking.dir_sort_tuple("abc.png")
    assert t3[2] == -(len("abc.png") - 1)


def test_rank_columns_match_tuples():
    ids = np.array(["best/a-b_c.png", "temp/" + "f" * 36 + ".png", "x (3).png"], object)
    cols = ranking.rank_columns(
        ids, np.ones(3, np.int32), np.array([10, 20, 30]), np.array([5, 5, 5]),
        good_dirs=("best",), bad_dirs=("temp",),
    )
    for i, iid in enumerate(ids):
        dt = ranking.dir_sort_tuple(iid, ("best",), ("temp",))
        assert cols["rk_dir_good"][i] == -dt[0]
        assert cols["rk_dir_bad"][i] == dt[1]
        assert cols["rk_dir_len"][i] == -dt[2]
        nt = ranking.name_sort_tuple(iid)
        assert cols["rk_name_hex"][i] == nt[0]
        assert cols["rk_name_punct"][i] == -nt[3]
        assert cols["rk_name_series"][i] == nt[4]


def test_partition_resolve_vector_equals_loop():
    """The vectorized partition resolve must match the per-cluster loop
    (make_resolve) row-for-row, including SuperState dest_path tie-breaks,
    on randomized clusters with ties and '!'-exempt ids."""
    import dataclasses

    import numpy as np
    import pandas as pd

    from deduplicator_ray.config import PipelineConfig
    from deduplicator_ray.stages.ranking import rank_columns
    from deduplicator_ray.stages.resolve import make_partition_resolve, make_resolve

    rng = np.random.default_rng(17)
    rows = []
    for cid in range(40):
        k = int(rng.integers(1, 6))
        for m in range(k):
            style = rng.choice(["d/a_{}.png", "d/e/b {} (2).png", "x!{}.bmp",
                                "plain{}", "best/c_{}.ppm"])
            iid = str(style).format(f"{cid}_{m}")
            rows.append({
                "cluster_id": f"c{cid:03d}",
                "image_id": iid,
                "proc_hash": f"{rng.integers(0, 2**60):016x}",
                "crc32": f"{rng.integers(0, 2**32):08X}",
                "pixels": int(rng.choice([100, 100, 400])),   # ties likely
                "filesize": int(rng.choice([10, 10, 50])),
                "frames": 1,
            })
    df = pd.DataFrame(rows)
    rk = rank_columns(df["image_id"].to_numpy(dtype=object),
                      df["frames"].to_numpy(), df["pixels"].to_numpy(),
                      df["filesize"].to_numpy())
    for name, arr in rk.items():
        df[name] = arr

    cfg = PipelineConfig()
    for sup in (False, True):
        vec = make_partition_resolve(cfg, with_superstate=sup)(df.copy())
        loop_fn = make_resolve(cfg, "cluster_id", sup)
        loop = pd.concat([loop_fn(g) for _, g in df.groupby("cluster_id")],
                         ignore_index=True)
        key = ["cluster_id", "image_id"]
        v = vec.sort_values(key).reset_index(drop=True)
        l = loop.sort_values(key).reset_index(drop=True)
        pd.testing.assert_frame_equal(v, l, check_like=True)
