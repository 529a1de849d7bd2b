import numpy as np
import pyarrow as pa


def _brute_chunks(text, window, stride):
    import re
    toks = [(m.start(), m.end(), m.group())
            for m in re.finditer(r"\S+", text)]
    n = len(toks)
    if n == 0:
        return []
    starts = [0]
    while starts[-1] + window < n:
        starts.append(starts[-1] + stride)
    out = []
    for s in starts:
        e = min(s + window, n)
        out.append((text[toks[s][0]:toks[e - 1][1]], e - s))
    return out


def test_chunk_documents_matches_brute(ray_session):
    import ray.data as rd

    from osm_cut_ray.stages.chunk import chunk_documents

    rng = np.random.default_rng(89)
    docs = []
    for d in range(60):
        n = int(rng.integers(0, 40))
        words = [f"w{rng.integers(0, 99)}" for _ in range(n)]
        # messy whitespace must survive inside chunks
        sep = ["  ", " ", "\n", "\t "]
        txt = ""
        for w in words:
            txt += w + sep[int(rng.integers(0, 4))]
        docs.append({"doc_id": d, "text": txt.rstrip()})
    docs.append({"doc_id": 900, "text": "   \n "})  # whitespace-only
    docs.append({"doc_id": 901, "text": ""})
    ds = rd.from_items(docs).repartition(4)

    window, stride = 10, 7
    got = chunk_documents(ds, window=window, stride=stride) \
        .to_pandas().sort_values(["doc_id", "chunk_ord"]) \
        .reset_index(drop=True)
    assert not (got["doc_id"] >= 900).any()  # empty docs emit nothing

    rows = []
    for d in docs:
        for k, (txt, nt) in enumerate(
                _brute_chunks(d["text"], window, stride)):
            rows.append((d["doc_id"], k, txt, nt))
    assert len(got) == len(rows)
    for i, (did, k, txt, nt) in enumerate(rows):
        assert int(got["doc_id"][i]) == did
        assert int(got["chunk_ord"][i]) == k
        assert got["text"][i] == txt
        assert int(got["n_tokens"][i]) == nt
    # n_chunks column consistent per doc
    for did, sub in got.groupby("doc_id"):
        assert (sub["n_chunks"] == len(sub)).all()

    # chunks re-tokenize to the claimed token count and the overlap
    # reconstructs the document's token stream
    import re
    for did, sub in got.groupby("doc_id"):
        orig = next(d["text"] for d in docs if d["doc_id"] == did)
        orig_toks = re.findall(r"\S+", orig)
        seen = []
        for r in sub.sort_values("chunk_ord").itertuples():
            ct = re.findall(r"\S+", r.text)
            assert len(ct) == r.n_tokens
            start = r.chunk_ord * stride
            assert ct == orig_toks[start:start + len(ct)]
            seen = seen[:start] + ct
        assert seen == orig_toks

    # disjoint chunking: stride == window covers exactly once
    dj = chunk_documents(ds, window=10, stride=10).to_pandas()
    tot = dj.groupby("doc_id")["n_tokens"].sum()
    for did, n in tot.items():
        orig = next(d["text"] for d in docs if d["doc_id"] == did)
        assert n == len(re.findall(r"\S+", orig))
