#!/usr/bin/env python3
"""Rounding-margin audit for the rounded-cosine oracle families.

Every oracle that emits or thresholds `round(cos, 3)` doubles is
cross-engine-safe only if no influencing cosine sits so close to a
rounding boundary (odd multiples of 0.0005) that a 1-ulp engine
difference could flip the rounded value. This script measures, for each
query family's actual influencing pair population, the minimum distance
of the unrounded cosine to its nearest boundary, at sf0.01 and sf0.1.

Families and their influencing populations (query vectors and centroids
are corpus rows, so every population is a subset of corpus pairs):
  - threshold membership (ns_dedup_embedding / _clusters / _semdedup /
    ns_curate_semantic_decon, all at >= 0.4 on the rounded value):
    ALL pairs vs the single 0.3995 boundary (membership flips there);
  - threshold emitted values: pairs that PASS (cos >= 0.3985, one grid
    step of slack) vs the nearest grid boundary (a passing pair's
    emitted rounded cos is hashed);
  - top-k / batch / assignment families (query or centroid vectors
    vec_id in {0..9, 11, 42, 123} and centroids vec_id < 8): all
    (q, corpus) cosines vs the nearest grid boundary (a flip anywhere
    in the candidate set can change rank order or top-k membership);
  - matryoshka prefix-16 top-k (query vec_id = 0): prefix-16 cosines.

Anything under ~1e-9 is flagged FRAGILE: it gets the integer-dot
treatment (see Similarity.intDotTopKBatch) or a fixture nudge.
Run: python3 scripts/margin_audit.py [testdata_root]
"""
import sys

import numpy as np
import pyarrow.parquet as pq


def grid_margin(cos):
    """Distance to the nearest round-3 boundary (odd multiple of 5e-4)."""
    m = cos * 1000.0
    return np.abs(m - np.floor(m) - 0.5) / 1000.0


def audit(sf_dir):
    t = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pydict()
    ids = np.array(t["vec_id"])
    order = np.argsort(ids)
    ids = ids[order]
    e = np.array([t["embedding"][i] for i in order], dtype=np.float64)
    n = e / np.linalg.norm(e, axis=1, keepdims=True)
    cos = n @ n.T                       # all-pairs, float64
    iu = np.triu_indices(len(ids), k=1)
    pair_cos = cos[iu]

    rows = []
    # threshold membership: the 0.3995 boundary over ALL pairs
    rows.append(("threshold 0.4 membership (all pairs)",
                 np.abs(pair_cos - 0.3995).min(), len(pair_cos)))
    # threshold emitted values: passing pairs (one grid step of slack)
    passing = pair_cos[pair_cos >= 0.3985]
    rows.append(("threshold emitted values (passing pairs)",
                 grid_margin(passing).min() if len(passing) else float("inf"),
                 len(passing)))
    # top-k / batch / centroid-assignment query populations
    qsel = np.isin(ids, list(range(10)) + [11, 42, 123])
    qpop = cos[qsel, :].ravel()
    qpop = qpop[np.abs(qpop - 1.0) > 1e-12]   # drop self pairs
    rows.append(("top-k/batch/assignment (q in 0..9,11,42,123 + cents<8)",
                 grid_margin(qpop).min(), len(qpop)))
    # matryoshka prefix-16, query 0
    p = e[:, :16]
    pn = p / np.linalg.norm(p, axis=1, keepdims=True)
    pcos = pn @ pn[0]
    pcos = pcos[1:]
    rows.append(("matryoshka prefix-16 top-k (q=0)",
                 grid_margin(pcos).min(), len(pcos)))
    # MMR lambda=0.6 (r13): the unrolled greedy oracle consumes the
    # round-3 REL values of query 0's top-40 candidates AND every
    # PAIRWISE round-3 cosine among those candidates (a 1-ulp flip in
    # any of them can move maxSim by a grid step and swap an argmax), so
    # both populations need grid margin. Score-difference ties between
    # distinct candidates are exact ties of the SAME rounded inputs on
    # both engines (identical IEEE ops), so only input rounding matters.
    rel0 = cos[ids == 0, :].ravel()
    # exclude the query by ID, exactly like the engine (id != queryId) — a
    # rel==1.0 mask would also drop exact-duplicate VECTORS the engine
    # keeps; and order candidates under the engine's HALF_UP (away from
    # zero) round-3, not np.round's half-to-even, so a .0005-boundary rel
    # cannot admit a different vector into the audited top-40
    mask = ids != 0
    half_up3 = np.sign(rel0[mask]) * np.floor(
        np.abs(rel0[mask]) * 1000 + 0.5) / 1000
    cand_order = np.lexsort((ids[mask], -half_up3))
    cand_idx = np.where(mask)[0][cand_order][:40]
    cc = cos[np.ix_(cand_idx, cand_idx)]
    cc = cc[np.triu_indices(len(cand_idx), k=1)]
    rows.append(("mmr candidate rel (q=0, top-40)",
                 grid_margin(rel0[mask][cand_order][:40]).min(),
                 min(40, mask.sum())))
    rows.append(("mmr candidate pairwise (top-40 x top-40)",
                 grid_margin(cc).min(), len(cc)))
    # reference: the all-pairs grid margin (the propagation query's OLD
    # exposure, retired by the integer-dot derivation)
    rows.append(("[retired] all-pairs grid (old propagation exposure)",
                 grid_margin(pair_cos).min(), len(pair_cos)))
    return rows


def margin6(x):
    """Distance to the nearest round-6 boundary (odd multiple of 5e-7)."""
    m = np.asarray(x, dtype=float) * 1e6
    return np.abs(m - np.floor(m) - 0.5) / 1e6


def half_up6(x):
    """Round-6 HALF_UP (away from zero) — the engines' law; np.round is
    half-to-even and can disagree exactly at the boundaries this script
    audits."""
    x = np.asarray(x, dtype=float)
    return np.sign(x) * np.floor(np.abs(x) * 1e6 + 0.5) / 1e6


def audit_psi(sf_dir):
    """PSI (ns_corpus_psi*) margins — the r12 ln-grid family: per-bin
    round-6 ln and round-6 term over the real char-length populations."""
    t = pq.read_table(f"{sf_dir}/documents.parquet")
    src = np.asarray(t.column("source"))
    ln_ = np.char.str_len(np.asarray(t.column("text"), dtype=str))
    a, b = ln_[src == "src0"], ln_[src != "src0"]
    bins = 16

    def binc(x):
        bn = np.clip((x.astype(np.int64) * 16) // 2048, 0, 15)
        return np.bincount(bn, minlength=bins).astype(np.int64)

    ca, cb = binc(a), binc(b)
    p = (ca + 0.5) / (ca.sum() + 0.5 * bins)
    q = (cb + 0.5) / (cb.sum() + 0.5 * bins)
    lnr = np.log(p / q)
    term = (p - q) * half_up6(lnr)
    return [("psi per-bin ln (round-6 grid)", margin6(lnr).min(), bins),
            ("psi per-bin term (round-6 grid)", margin6(term).min(), bins)]


def audit_lr(sf_dir):
    """ns_quality_lr_score margins (r15 ADVICE): the oracle replays
    round(sigmoid(margin), 6) with DuckDB's std::exp against the JVM's
    Math.exp — a 1-ulp disagreement flips p (and predicted near p=0.5)
    only if a raw value sits within ~1e-9 of the round-6 half grid. This
    replicates lrTrainSerial's exact integer-grid arithmetic (the proven
    equal-to-distributed law: md5-lower64 buckets, nano-grid weights,
    Java-round residuals to the micro grid) and measures, over the real
    score slice, the distance of (a) each raw margin from the round-6
    grid, (b) each raw sigmoid from the round-6 grid, (c) each raw
    sigmoid from 0.4999995 — the rounded-p>=0.5 prediction flip, and
    (d) each TRAINING-iteration raw residual from ITS micro half grid
    (a flip there would diverge the learned weights themselves)."""
    import hashlib
    import math

    t = pq.read_table(f"{sf_dir}/documents.parquet").to_pydict()
    B = 1024

    def md5l64(s):
        return int.from_bytes(hashlib.md5(s.encode()).digest()[8:16],
                              "little", signed=True)

    def jround(x):
        # Java Math.round(double) is NOT floor(x + 0.5): for raw values
        # within 1 ulp below an n+0.5 boundary (e.g. 0.49999999999999994),
        # x + 0.5 rounds UP to n+0.5 in double arithmetic and floor(x+0.5)
        # returns n+1 where Java returns n. The JDK (8+) special-cases
        # this: floor(x + 0.5 - ulp_adjust) via bit twiddling. Exactly the
        # near-half-grid cases this audit measures, so replicate the JDK
        # result: floor(x) + 1 iff x > (the largest double strictly below
        # floor(x)+0.5), i.e. iff x >= floor(x)+0.5 after accounting for
        # the representable predecessor (r16 ADVICE).
        fl = math.floor(x)
        half = fl + 0.5
        if x >= half:
            return fl + 1
        # x < half exactly as doubles -> Java rounds down, even when
        # x + 0.5 == half + eps by double rounding
        return fl

    feats = []
    for did, text, lang in zip(t["doc_id"], t["text"], t["lang"]):
        toks = text.strip().lower().split()
        f = toks + [a + " " + b for a, b in zip(toks, toks[1:])]
        cnts = {}
        for x in f:
            b = md5l64(x) % B
            cnts[b] = cnts.get(b, 0) + 1
        feats.append((did, 1 if lang == "en" else 0, cnts))
    train = [(y, c) for did, y, c in feats if md5l64(str(did)) % 100 < 80]
    score = [c for did, y, c in feats if md5l64(str(did)) % 100 >= 80]

    n = len(train)
    w = [0] * (B + 1)  # [bias, w_0 .. w_{B-1}], nano grid
    resid_margin = 1.0  # distance of raw residual to the micro half grid
    for _ in range(5):
        grads = {}
        bias_g = 0
        for y, cnts in train:
            m_nano = sum(w[b + 1] * c for b, c in cnts.items()) + w[0]
            raw = 1e6 / (1.0 + math.exp(-(m_nano / 1e9)))
            resid_margin = min(resid_margin,
                               abs(raw - math.floor(raw) - 0.5) / 1e6)
            r = jround(raw) - y * 1000000
            bias_g += r
            for b, c in cnts.items():
                grads[b] = grads.get(b, 0) + r * c
        def upd(wo, g):
            return jround(wo - 0.5 * (g / 1e6) / n * 1e9)
        w = [upd(w[0], bias_g)] + [
            upd(w[b + 1], grads.get(b, 0)) for b in range(B)]

    m_nano = np.array([
        sum(w[b + 1] * c for b, c in cnts.items()) + w[0]
        for cnts in score], dtype=np.int64)
    margins = m_nano / 1e9
    sig = 1.0 / (1.0 + np.exp(-margins))
    # Hazard calibration (this family is NOT on the cosine families'
    # 1e-9 scale):
    #  - margin: m_nano is an exact integer both engines divide by 1e9
    #    identically — ZERO float divergence. Docs can sit EXACTLY on the
    #    round-6 half (m_nano ≡ 500 mod 1000; sf0.1 has two: doc 77 at
    #    -5.4955025, doc 521 at -36.2034485). Both engines resolve these
    #    the same way — Spark round() goes through
    #    BigDecimal.valueOf(double) (the SHORTEST-decimal repr, which IS
    #    the exact half) + HALF_UP, and DuckDB round(DOUBLE) agrees
    #    (verified: both emit -5.495503 / -36.203449; the r15 sf0.1 gate
    #    hashed this query green WITH those docs). So the row is
    #    informational — hazard None — with the exact-half count in its
    #    population column.
    #  - sigmoid p / predicted: the one cross-engine float op is
    #    exp(-margin) on an IDENTICAL double; libm disagreement is ~1 ulp
    #    → |Δp| ≲ 1e-15. Hazard 1e-13 (100× safety).
    #  - training residual: audit-INTERNAL fidelity only (python exp vs
    #    JVM exp while replicating training). The oracle consumes FED
    #    weights published by the engine itself, so training divergence
    #    cannot break the gate; this replication is cross-checked
    #    bit-exact against 13 published engine weight dumps. Hazard None.
    exact_half = int((np.abs(m_nano) % 1000 == 500).sum())
    return [(f"lr_score margin (int nano; exact-half={exact_half})",
             margin6(margins).min(), len(margins), None),
            ("lr_score sigmoid p (round-6 grid, score slice)",
             margin6(sig).min(), len(sig), 1e-13),
            ("lr_score predicted flip (raw p vs 0.4999995)",
             np.abs(sig - 0.4999995).min(), len(sig), 1e-13),
            ("lr_train residual (micro half grid, audit-internal)",
             resid_margin, 5 * n, None)]


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata"
    print(f"{'population':<55} {'sf0.01':>12} {'sf0.1':>12}")
    r1 = audit(f"{root}/sf0.01") + audit_psi(f"{root}/sf0.01") \
        + audit_lr(f"{root}/sf0.01")
    r2 = audit(f"{root}/sf0.1") + audit_psi(f"{root}/sf0.1") \
        + audit_lr(f"{root}/sf0.1")
    # rows are (name, margin, n) with the default 1e-9 cosine-family
    # hazard, or (name, margin, n, hazard) with a family-calibrated one
    # (hazard None = informational row, never flagged — see audit_lr)
    fragile = 0
    for row1, row2 in zip(r1, r2):
        name, m1 = row1[0], row1[1]
        m2 = row2[1]
        if row2[0] != name:  # per-SF annotations (e.g. exact-half counts)
            name = f"{name} / {row2[0].rsplit('(', 1)[1].rstrip(')')}"
        hazard = row1[3] if len(row1) > 3 else 1e-9
        flag = ""
        if name.startswith("[retired]") or hazard is None:
            pass
        elif min(m1, m2) < hazard:
            fragile += 1
            flag = "  FRAGILE"
        print(f"{name:<55} {m1:>12.3e} {m2:>12.3e}{flag}")
    print(f"\nfragile active populations: {fragile} "
          f"({'OK' if fragile == 0 else 'ACTION NEEDED'})")
    sys.exit(1 if fragile else 0)


if __name__ == "__main__":
    main()
