"""DP release pins: noise == documented inverse-CDF replay (release
fully deterministic, partition-invariant); Laplace scale behaves;
clipping applied before aggregation; histogram threshold."""

import numpy as np
import pandas as pd
import pyarrow as pa


def _df(n=3000, seed=1):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "key": rng.integers(0, 40, n).astype(np.int64),
        "val": rng.normal(0, 2.0, n)})


def _collect(ds):
    return pa.concat_tables(
        [pa.table(b) for b in
         ds.iter_batches(batch_format="pyarrow")]).to_pandas() \
        .sort_values("key").reset_index(drop=True)


def test_release_matches_brute_replay_and_partitioning(ray_session):
    import ray.data as rd

    from osm_cut_ray.stages.dp_noise import (_laplace_from_uniform,
                                             dp_key_release)
    from osm_cut_ray.stages.wsample import uniform_hash

    df = _df()
    eps, clip, seed, qb = 0.7, 1.5, 11, 20
    outs = []
    for parts in (1, 9):
        ds = rd.from_pandas(df).repartition(parts)
        outs.append(_collect(dp_key_release(
            ds, key_col="key", value_col="val", epsilon=eps,
            clip=clip, seed=seed, quant_bits=qb)))
    g1, g2 = outs
    assert (g1["dp_count"].to_numpy()
            == g2["dp_count"].to_numpy()).all()
    assert (g1["dp_sum"].to_numpy() == g2["dp_sum"].to_numpy()).all()

    # independent replay of the documented rule
    S = float(1 << qb)
    keys = np.sort(df["key"].unique()).astype(np.int64)
    cnt = df.groupby("key")["key"].size().loc[keys].to_numpy()
    qsum = df.assign(q=np.round(np.clip(df["val"], -clip, clip) * S)
                     .astype(np.int64)) \
        .groupby("key")["q"].sum().loc[keys].to_numpy()
    exp_cnt = cnt + _laplace_from_uniform(
        uniform_hash(keys, seed * 4 + 1), 1.0 / (eps / 2))
    exp_sum = qsum / S + _laplace_from_uniform(
        uniform_hash(keys, seed * 4 + 2), clip / (eps / 2))
    assert (g1["key"].to_numpy() == keys).all()
    assert (g1["dp_count"].to_numpy() == exp_cnt).all()
    assert (g1["dp_sum"].to_numpy() == exp_sum).all()


def test_noise_scale_tracks_epsilon(ray_session):
    import ray.data as rd

    from osm_cut_ray.stages.dp_noise import dp_key_release

    # many keys, one row each: dp_count - 1 IS the noise sample
    df = pd.DataFrame({"key": np.arange(4000, dtype=np.int64)})
    ds = rd.from_pandas(df)

    def mad(eps):
        got = _collect(dp_key_release(ds, key_col="key",
                                      epsilon=eps, seed=5))
        return float(np.abs(got["dp_count"].to_numpy() - 1.0).mean())

    # Laplace mean |x| = scale = 1/eps
    m1, m4 = mad(1.0), mad(4.0)
    assert 0.8 < m1 < 1.25          # ~1.0
    assert 0.2 < m4 < 0.32          # ~0.25
    assert m1 > 3 * m4


def test_clip_bounds_sum_influence(ray_session):
    import ray.data as rd

    from osm_cut_ray.stages.dp_noise import dp_key_release

    # one outlier row of 1e6 in key 0 must move the released sum by
    # at most clip
    base = pd.DataFrame({"key": np.zeros(50, np.int64),
                         "val": np.ones(50)})
    spiked = pd.concat([base, pd.DataFrame(
        {"key": [0], "val": [1e6]})], ignore_index=True)
    clip = 2.0
    r1 = _collect(dp_key_release(rd.from_pandas(base), key_col="key",
                                 value_col="val", epsilon=1e9,
                                 clip=clip, seed=3))
    r2 = _collect(dp_key_release(rd.from_pandas(spiked),
                                 key_col="key", value_col="val",
                                 epsilon=1e9, clip=clip, seed=3))
    # huge epsilon -> negligible noise; difference == one clipped row
    assert abs((r2["dp_sum"][0] - r1["dp_sum"][0]) - clip) < 1e-3


def test_histogram_threshold_suppresses(ray_session):
    import ray.data as rd

    from osm_cut_ray.stages.dp_noise import dp_histogram

    df = pd.DataFrame({"key": np.repeat(
        np.arange(20, dtype=np.int64), np.where(
            np.arange(20) < 5, 100, 1))})
    got = _collect(dp_histogram(rd.from_pandas(df), key_col="key",
                                epsilon=2.0, seed=7, threshold=50))
    assert set(got["key"]) == set(range(5))
    assert (got["dp_count"] >= 50).all()
