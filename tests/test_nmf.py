"""NMF pins: bit-identical across partitionings; == single-process
numpy replay of the documented quantized rule; reconstruction error
decreases; planted disjoint-vocabulary topics recovered."""

import numpy as np
import pyarrow as pa


def _corpus(n=120, seed=5):
    """Three disjoint vocabularies -> planted topics."""
    rng = np.random.default_rng(seed)
    vocab = [
        ["castle", "knight", "sword", "tower", "moat", "king"],
        ["tensor", "matrix", "vector", "kernel", "gradient", "loss"],
        ["pasta", "tomato", "basil", "olive", "garlic", "oven"],
    ]
    rows = []
    truth = []
    for i in range(n):
        g = i % 3
        words = rng.choice(vocab[g], 30).tolist()
        rows.append({"doc_id": i, "text": " ".join(words)})
        truth.append(g)
    return rows, truth


def _collect(ds):
    return pa.concat_tables(
        [pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")])


def test_partition_invariant_bit_identical(ray_session):
    import ray.data as rd

    from osm_cut_ray.stages.nmf import nmf_fit

    rows, _ = _corpus()
    outs = []
    for parts in (1, 7):
        ds = rd.from_items(rows).repartition(parts)
        dt, h = nmf_fit(ds, k=4, v_dim=256, n_iter=6, seed=3)
        t = _collect(dt).sort_by("id")
        outs.append((t, h))
    (t1, h1), (t2, h2) = outs
    assert (h1 == h2).all()          # BIT-identical H
    assert t1["topic"].to_pylist() == t2["topic"].to_pylist()
    w1 = np.concatenate(t1["w"].to_pandas().to_numpy())
    w2 = np.concatenate(t2["w"].to_pandas().to_numpy())
    assert (w1 == w2).all()          # BIT-identical W


def test_matches_single_process_replay(ray_session):
    import ray.data as rd

    from osm_cut_ray.stages import nmf as M

    rows, _ = _corpus(n=60, seed=9)
    k, v_dim, n_iter, seed, qb = 3, 128, 5, 1, 24
    ds = rd.from_items(rows).repartition(5)
    dt, h = M.nmf_fit(ds, k=k, v_dim=v_dim, n_iter=n_iter, seed=seed,
                      quant_bits=qb)
    got = _collect(dt).sort_by("id")

    # ---- independent serial replay of the documented rule ----
    feat = _collect(M.featurize_docs(
        rd.from_items(rows), v_dim=v_dim)).sort_by("id")
    ids, fi, fc, fd, m = M._flat(feat)
    S = np.float64(1 << qb)
    w = M._w_init(ids, k, seed)
    hh = M._h_init(k, v_dim, seed)
    for _ in range(n_iter):
        xht = np.zeros((m, k))
        np.add.at(xht, fd, (hh[:, fi] * fc).T)
        w = w * xht / (w @ (hh @ hh.T) + 1e-12)
        wtx = np.zeros((k, v_dim), np.int64)
        np.add.at(wtx.T, fi,
                  np.round(w[fd] * fc[:, None] * S).astype(np.int64))
        wtw = np.round(w[:, :, None] * w[:, None, :] * S) \
            .astype(np.int64).sum(axis=0)
        hh = hh * (wtx / S) / ((wtw / S) @ hh + 1e-12)
    assert (h == hh).all()
    gw = np.stack(got["w"].to_pandas().to_numpy())
    assert (gw == w).all()


def test_reconstruction_error_decreases(ray_session):
    import ray.data as rd

    from osm_cut_ray.stages import nmf as M

    rows, _ = _corpus(n=90, seed=2)
    ds = rd.from_items(rows)
    feat = _collect(M.featurize_docs(ds, v_dim=128)).sort_by("id")
    ids, fi, fc, fd, m = M._flat(feat)
    x = np.zeros((m, 128))
    x[fd, fi] = fc

    def err(n_iter):
        dt, h = M.nmf_fit(rd.from_items(rows), k=3, v_dim=128,
                          n_iter=n_iter, seed=4)
        t = _collect(dt).sort_by("id")
        w = np.stack(t["w"].to_pandas().to_numpy())
        return float(((x - w @ h) ** 2).sum())

    e0, e3, e8 = err(0), err(3), err(8)
    assert e3 < e0 and e8 < e3


def test_planted_topics_recovered(ray_session):
    import ray.data as rd

    from osm_cut_ray.stages.nmf import nmf_fit

    rows, truth = _corpus(n=150, seed=7)
    dt, h = nmf_fit(rd.from_items(rows).repartition(4), k=3,
                    v_dim=512, n_iter=12, seed=0)
    t = _collect(dt).sort_by("id")
    topics = np.asarray(t["topic"].to_pylist())
    truth = np.asarray(truth)
    # each planted group maps to ONE dominant learned topic and the
    # three groups map to three distinct topics
    assign = {}
    for g in range(3):
        vals, cnts = np.unique(topics[truth == g],
                               return_counts=True)
        dom = vals[np.argmax(cnts)]
        assert cnts.max() / (truth == g).sum() > 0.95, g
        assign[g] = dom
    assert len(set(assign.values())) == 3
