"""The scale-factor amplifier's decorrelation invariants (pure
pyarrow — no Spark): near-dup FAMILY SIZE must stay bounded at any
factor. The r12 sf10 lesson: factor-100 replication with only the
every-8th-token mark built 100-strong families whose shared prefix
tokens hit df=100, so the lossless candidate join's collision count
grew ~factor² (1.24e9 rows measured) — the checkpoint timed a data
artifact, not plan behavior. The tier remap pins families at ≤ 10."""

from __future__ import annotations

import itertools

import pyarrow as pa
import pyarrow.parquet as pq

from tools.gen_scale import amplify


def _shingles(text: str, n: int = 3) -> set[str]:
    w = text.split(" ")
    return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}


def _amplified_docs(tmp_path, factor: int):
    src = tmp_path / "src"
    dst = tmp_path / f"dst{factor}"
    src.mkdir()
    base = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(
                [
                    " ".join(f"w{j}" for j in range(32)),
                    " ".join(f"v{j}" for j in range(32)),
                ],
                pa.string(),
            ),
        }
    )
    pq.write_table(base, f"{src}/documents.parquet")
    for name in (
        "region nation customer supplier part orders lineitem events "
        "embeddings"
    ).split():
        pq.write_table(
            pa.table({"k": pa.array([], pa.int64())}),
            f"{src}/{name}.parquet",
        )
    # the non-document tables lack their key columns — restrict the
    # amplifier's table map to documents for this fixture
    import tools.gen_scale as g

    orig = dict(g.KEY_COLS)
    g.KEY_COLS.clear()
    g.KEY_COLS["documents"] = ("doc_id",)
    try:
        amplify(str(src), str(dst), factor)
    finally:
        g.KEY_COLS.clear()
        g.KEY_COLS.update(orig)
    return pq.read_table(f"{dst}/documents.parquet")


def test_factor10_families_share_half_their_shingles(tmp_path):
    docs = _amplified_docs(tmp_path, 10)
    rows = {
        r["doc_id"]: r["text"] for r in docs.to_pylist()
    }
    fam = [rows[0 + i * 10_000_000] for i in range(10)]
    for a, b in itertools.combinations(fam, 2):
        sa, sb = _shingles(a), _shingles(b)
        j = len(sa & sb) / len(sa | sb)
        # every 8th token perturbed: family pairs are GENUINE
        # near-duplicates (3-gram J ≈ 0.45-0.62, above the 0.4 dedup
        # threshold — the dedup queries need dupes to find) but never
        # the degenerate J ≈ 1.0 tie cliques the mark exists to break
        assert 0.4 <= j < 0.9, (j, a[:40], b[:40])


def test_higher_factors_add_tiers_not_family_members(tmp_path):
    docs = _amplified_docs(tmp_path, 25)
    rows = {r["doc_id"]: r["text"] for r in docs.to_pylist()}
    copies = [rows[0 + i * 10_000_000] for i in range(25)]
    # cross-TIER copies share zero shingles (fresh vocabulary) …
    for i, j in ((0, 10), (0, 20), (9, 10), (15, 24)):
        assert not (_shingles(copies[i]) & _shingles(copies[j])), (i, j)
    # … while within-tier structure matches the factor-10 shape
    for i, j in ((10, 19), (20, 24)):
        sa, sb = _shingles(copies[i]), _shingles(copies[j])
        jac = len(sa & sb) / len(sa | sb)
        assert 0.4 <= jac < 0.9, (i, j, jac)
    # so the max shingle document-frequency — the collision join's
    # bucket occupancy — is the TIER size, not the factor
    from collections import Counter

    df = Counter(
        s for c in copies for s in _shingles(c)
    )
    assert max(df.values()) <= 10


def test_factor_le_10_output_matches_pre_tier_generator(tmp_path):
    # tier 0 must be byte-identical to the historical generator: the
    # committed scaling_r12.json sf1 numbers stay comparable
    docs = _amplified_docs(tmp_path, 10)
    for r in docs.to_pylist():
        assert "tr" not in r["text"], r["text"][:60]
