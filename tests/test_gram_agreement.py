"""Cross-IMPLEMENTATION agreement between the two PC1 eigensolvers.

Each power-iteration query hash-matches its own DuckDB oracle, but the
oracles share their builder's arithmetic — a semantic bug expressed
identically on both sides would pass both gates.  The exact centered
baseline and the Gram-matrix twin compute the covariance by two
genuinely different algorithms (centered self-join vs Σxxᵀ/n − μμᵀ
with different rounding points), so their AGREEMENT on the dominant
eigenvector/eigenvalue is independent evidence that both compute PCA,
not merely their own oracle's arithmetic.  Sign is pinned by
construction: both iterate from the same uniform positive start vector
through the shared ``_power_iterate`` trajectory.

Measured at sf0.01: cosine 1.0 to 9 dp, eigenvalues identical at the
6-dp output rounding.  The assertions leave slack for the rounding-
point difference (9-dp raw vs centered products) to show up at other
fixtures without letting an actual semantic divergence through.
"""

from __future__ import annotations

import math

from tests.conftest import SF_ORACLE as SF


def test_exact_and_gram_pc1_agree(spark):
    from discogs_etl_spark import registry

    qs = registry.queries()
    exact = {
        r["pos"]: (r["loading"], r["eigenvalue"])
        for r in qs["embedding_power_iteration_pc1"](spark, SF).collect()
    }
    gram = {
        r["pos"]: (r["loading"], r["eigenvalue"])
        for r in qs["embedding_power_iteration_pc1_gram"](spark, SF).collect()
    }
    assert exact.keys() == gram.keys() and len(exact) == 64

    dot = sum(exact[p][0] * gram[p][0] for p in exact)
    n_e = math.sqrt(sum(v[0] ** 2 for v in exact.values()))
    n_g = math.sqrt(sum(v[0] ** 2 for v in gram.values()))
    cos = abs(dot / (n_e * n_g))
    assert cos > 0.9999, f"PC1 directions diverged: |cos| = {cos}"

    eig_e = next(iter(exact.values()))[1]
    eig_g = next(iter(gram.values()))[1]
    assert abs(eig_e - eig_g) <= 1e-4, (
        f"dominant-eigenvalue estimates diverged: exact {eig_e} vs gram {eig_g}"
    )
