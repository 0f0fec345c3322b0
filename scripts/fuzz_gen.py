#!/usr/bin/env python3
"""Adversarial micro-corpus generator — the BATCH twin of
WatermarkFuzzSpec (r14, VERDICT ask 2).

All three r13 sf1 divergences were engine boundaries invisible at
fixture distributions (round-half doubles, INT overflow, blocking
density). This generator perturbs the sf0.001 fixtures into a corpus
that CONCENTRATES those boundaries, so the DuckDB differential can
probe them every round at micro cost:

  - .00005 round-half lattice values (quantities, prices, balances,
    event values) — the class that bit e_window_analytic and
    j_text_unigram_lm at sf1;
  - magnitudes >= 4e9 (INT/accumulator overflow probes);
  - degenerate groups: a 1-row group, an all-equal group (zero
    variance -> regr_r2/corr division boundary), customers with no
    orders (empty-group joins);
  - unicode text: CJK, combining accents, emoji, RTL, plus shared
    ASCII prefixes so the fuzzy-names blocker keeps the pairs;
  - duplicate cliques: one document x10 exact copies, near-dup
    single-token perturbations, one embedding vector shared by 8 ids
    (the ANN dupGroups collapse path);
  - quantize boundaries: embedding components at (k+0.5)/127 so
    round(x*127) sits exactly on a .5;
  - timestamp ties: 40 events of one user on one timestamp (window
    tie-break determinism), a single-event user (cohort of 1);
  - NULL props on a slice of events.

Schema fidelity: every table is read and re-written through pyarrow
with its ORIGINAL schema object, so parquet logical types (timestamp
units, float32 lists) survive byte-for-byte semantics — the footer
unit sniffing in Tables.events keeps working.

Usage:
  python3 scripts/fuzz_gen.py OUTDIR [--seed N] [--base SFDIR]

Then the sweep (see SCALE.md "FUZZ" sections for recorded runs):
  sbt -batch "runMain graft.Verify OUTDIR /tmp/fuzz_dump $(python3 scripts/fuzz_gen.py --entries)"
  python3 scripts/oracle_check.py OUTDIR /tmp/fuzz_dump
"""
import os
import random
import sys

import pyarrow as pa
import pyarrow.parquet as pq

BASE = "/root/testdata/sf0.001"

# The arithmetic/round/unicode/dup-sensitive entries this corpus is
# built to probe. Kept in the generator so the sweep command line and
# the corpus evolve together.
ENTRIES = [
    # round-half / decimal / rational class
    "d_agg_groupby_q1", "d_agg_global", "d_agg_conditional",
    "d_agg_stats", "d_agg_regression", "d_agg_gini",
    "d_agg_mode_median", "d_agg_mad_robust", "d_agg_percentile",
    "d_agg_approx_percentile", "d_agg_quantile_sketch_range",
    "d_agg_quantile_sketch_union", "d_agg_sketch_range",
    "d_agg_sketch_union", "d_agg_histogram",
    "e_window_analytic", "e_anomaly_zscore", "e_window_pareto",
    "e_retention_cohorts", "h_math_funcs", "l_udaf_aggregator",
    # text/LM decimal class
    "j_text_unigram_lm", "j_text_bigram_lm", "j_quality_centroid",
    "j_quality_lm_filter", "j_corpus_drift", "j_corpus_report",
    "j_text_zipf", "j_text_quality", "j_text_collocations",
    # integer-ratio class (r14 exact-migrated — prove it)
    "j_jaccard_shingle_pairs", "j_dedup_containment",
    # unicode / tokenizer class
    "j_dedup_fuzzy_names", "j_text_normalize", "j_langid_chargram",
    "j_text_bpe_tokenize", "j_dedup_exact_text", "j_text_fingerprint",
    # dup-clique / similarity class
    "j_dedup_cascade", "j_dedup_clusters", "j_sim_cosine_topk",
    "j_sim_tfidf_pairs", "j_embed_quantize", "j_embed_norm_stats",
    "j_embed_dim_stats", "j_ann_ivf_topk",
    # window-tie / event class
    "e_window_rank", "e_funnel_sessions", "e_window_gap_islands",
    # r16 widening (VERDICT r15 ask 8): timestamp/timezone boundary
    # consumers — as-of tolerance edges, session-gap == threshold,
    # calendar truncation at month/year/leap/DST/pre-epoch instants
    "c_join_asof", "c_join_asof_forward", "c_join_asof_nearest",
    "h_date_funcs", "e_window_gap_fill", "e_window_lag_lead",
    "e_attribution_last_touch", "k_window_tumbling", "k_window_session",
    # r16 widening: non-ASCII multi-byte string consumers
    "h_string_funcs", "h_regex_funcs",
]

UNICODE_NAMES = [
    "Customer#FZ-unicode 北京市朝陽區",
    "Customer#FZ-unicode 北京市朝阳区",   # trad/simp near-pair
    "Customer#FZ-unicode café résumé",
    "Customer#FZ-unicode café résumé",  # combining
    "Customer#FZ-unicode Ωμέγα παράδειγμα",
    "Customer#FZ-unicode Ωμεγα παραδειγμα",
    "Customer#FZ-unicode مرحبا بالعالم",
    "Customer#FZ-unicode مرحبا بالعالَم",
    "Customer#FZ-unicode 🚀 emoji pair A",
    "Customer#FZ-unicode 🚀 emoji pair B",
    # r16 widening: multi-byte beyond the BMP + invisible code points
    "Customer#FZ-unicode 👨‍👩‍👧 zwj family",
    "Customer#FZ-unicode 👨👩👧 zwj family",       # ZWJ-stripped twin
    "Customer#FZ-unicode non breaking pair",
    "Customer#FZ-unicode non breaking pair",       # NBSP vs space twin
    "Customer#FZ-unicode 𝔘𝔫𝔦𝔠𝔬𝔡𝔢 fraktur",
    "Customer#FZ-unicode Unicode fraktur",         # ASCII-fold twin
]

UNICODE_DOCS = [
    "數據 管道 的 重複 偵測 測試 數據 管道 的 重複 偵測 測試",
    "数据 管道 的 重复 检测 测试 数据 管道 的 重复 检测 测试",
    "le café est très bon et le café est très cher",
    "le café est trés bon et le café est trés cher",
    "اختبار خط انابيب البيانات اختبار خط انابيب البيانات",
    "τεστ αγωγού δεδομένων τεστ αγωγού δεδομένων",
    "🚀 rocket emoji token test 🚀 rocket emoji token test",
    "tab\tand  double space token boundary test case here",
    "word",  # single-token doc
    "same same same same same same same same same same",  # one repeated token
    # r16 widening (VERDICT r15 ask 8): multi-byte beyond the BMP and
    # invisible/width-variant code points through the tokenize /
    # normalize / fingerprint / BPE consumers
    "𝔘𝔫𝔦𝔠𝔬𝔡𝔢 𝔣𝔯𝔞𝔨𝔱𝔲𝔯 astral tokens 𝔘𝔫𝔦𝔠𝔬𝔡𝔢 𝔣𝔯𝔞𝔨𝔱𝔲𝔯 astral tokens",
    "👨‍👩‍👧‍👦 zwj family grapheme cluster test 👍🏽 skin tone modifier",
    "﻿bom prefixed token stream test ﻿bom prefixed token",
    "non breaking space inside tokens non breaking space",
    "全角　スペース　区切り 全角　スペース　区切り",
    "á̂̃ stacked combining marks over one base letter",
]


def lattice(rng, lo, hi):
    """A value exactly on the m/20000 lattice (.00005 multiples)."""
    m = rng.randint(int(lo * 20000), int(hi * 20000))
    return m / 20000.0


def big2dp(rng):
    """Overflow-probe magnitude (>= 4e9) on a 2-DECIMAL lattice — the
    representable shape (cents at 4e9 = 12 significant digits, well
    inside a double). The first sweep used the 5e-5 lattice AT 4e9,
    which exceeds what any engine can carry through a double (ulp ~
    5e-7 at that magnitude vs a 1e-6 quantization quantum): the
    resulting Det.dsum divergence was quantization ill-conditioning of
    the INPUT, not an operator defect — see the Det scaladoc's
    conditioning-domain note (r14 FUZZ sweep 1, SCALE.md)."""
    return 4.0e9 + rng.randint(0, 100000) / 100.0


def read(t):
    return pq.read_table(os.path.join(BASE_DIR, f"{t}.parquet"))


def write(outdir, t, tbl):
    pq.write_table(tbl, os.path.join(outdir, f"{t}.parquet"))


def rebuild(tbl, cols):
    """Rebuild `tbl` with python-level column replacements, keeping the
    ORIGINAL arrow schema (logical types survive)."""
    data = tbl.to_pydict()
    data.update(cols)
    return pa.Table.from_pydict(data, schema=tbl.schema)


def append_rows(tbl, rows):
    """Append python dict-rows, casting through the original schema."""
    data = tbl.to_pydict()
    for r in rows:
        for name in tbl.column_names:
            data[name].append(r[name])
    return pa.Table.from_pydict(data, schema=tbl.schema)


def fuzz_lineitem(rng, outdir):
    tbl = read("lineitem")
    qty = list(tbl.column("l_quantity").to_pylist())
    price = list(tbl.column("l_extendedprice").to_pylist())
    flag = tbl.column("l_returnflag").to_pylist()
    n = len(qty)
    for i in range(n):
        r = rng.random()
        if r < 0.30:
            qty[i] = lattice(rng, 1, 50)
        if r < 0.20:
            price[i] = lattice(rng, 100, 90000)
        elif r < 0.22:
            price[i] = big2dp(rng)  # overflow probe (2dp — representable)
    # an all-equal slice inside one flag: zero variance against qty
    eq = [i for i in range(n) if flag[i] == "R"][:40]
    for i in eq:
        qty[i] = 25.0
        price[i] = 31250.0
    # --- r15 widening (VERDICT ask 9): engine-INTERNAL double
    # aggregates (stddev/corr/median/regr) on boundary-straddling
    # shapes — the disclosed residual of the binary-r4 migration ---
    # (a) summation-cancellation probes live on EVENTS (per-user
    # zscore windows), not on lineitem qty: a qty offset inflates
    # sd_qty and with it |covar(qty, price)| — and once an
    # engine-internal double aggregate's MAGNITUDE grows, the display
    # contract degrades measurably (r15, both draws quantified it:
    # offset 2e6 → var ≈ 6.25e12, past the 9e11 identity cutoff, raw
    # engine ulps compared directly, 6250234910235.045 vs .043; offset
    # 2e4 → cov ≈ 6.2e10, straddle probability ≈ |x|·2.2e-12 ≈ 1e-2
    # per value per draw, hit on seed 37: 62117973785.9501 vs .9502).
    # The 4-decimal display of a ≥1e10 engine-internal statistic asks
    # for more agreement than doubles carry — the documented domain
    # boundary (SCALE.md §r15), not an operator defect. (Draw 1 DID
    # catch a real in-domain defect here: pow(x,2) vs x*x — fixed in
    # h_math_funcs.)
    # (b) near-collinear pair probe: price ~ affine(qty) + tiny lattice
    # noise pushes corr/r2 against the 1.0 boundary, where the two
    # engines' merge orders differ at the last ulp
    lin = [i for i in range(n) if flag[i] == "N"][:60]
    # an under-populated draw must fail loudly, not silently skip the
    # probe (ADVICE r15): both slices assume the base corpus carries
    # enough matching flag rows
    assert len(lin) >= 20, (
        f"collinear probe under-populated: {len(lin)} N-flag rows < 20")
    for i in lin:
        q = lattice(rng, 1, 50)
        qty[i] = q
        price[i] = round(7.5 * q + rng.randint(0, 3) / 20000.0, 5)
    # (c) median/percentile half-boundary: a run of rows pinned to an
    # ODD multiple of 5e-5 (an exact r4 half) — the binary-r4 rule must
    # round the identical double identically on both engines
    half = [i for i in range(n) if flag[i] == "R"][40:60]
    assert len(half) >= 10, (
        f"median half-boundary probe under-populated: {len(half)} rows "
        f"in the [40:60] R-flag slice < 10")
    for i in half:
        qty[i] = 12.34565
    write(outdir, "lineitem", rebuild(tbl, {
        "l_quantity": qty, "l_extendedprice": price}))


def fuzz_orders(rng, outdir):
    tbl = read("orders")
    price = list(tbl.column("o_totalprice").to_pylist())
    cust = tbl.column("o_custkey").to_pylist()
    n = len(price)
    for i in range(n):
        r = rng.random()
        if r < 0.30:
            price[i] = lattice(rng, 1000, 400000)
        elif r < 0.32:
            price[i] = big2dp(rng)
    tbl = rebuild(tbl, {"o_totalprice": price})
    # empty groups: drop every order of ~8 customers (keep the
    # customers in their table — left joins / anti joins see them)
    victims = set(rng.sample(sorted(set(cust)), k=min(8, len(set(cust)))))
    keep = [i for i, c in enumerate(cust) if c not in victims]
    write(outdir, "orders", tbl.take(pa.array(keep)))


def fuzz_customer(rng, outdir):
    tbl = read("customer")
    names = list(tbl.column("c_name").to_pylist())
    bal = list(tbl.column("c_acctbal").to_pylist())
    n = len(names)
    # unicode names on existing rows (keeps FK integrity with orders);
    # placed pairwise so the 17-char-prefix blocker finds each pair
    idxs = rng.sample(range(n), k=min(len(UNICODE_NAMES), n))
    for j, i in enumerate(idxs):
        names[i] = UNICODE_NAMES[j]
    for i in range(n):
        if rng.random() < 0.4:
            bal[i] = lattice(rng, -999, 9999)
    write(outdir, "customer", rebuild(tbl, {
        "c_name": names, "c_acctbal": bal}))


def fuzz_documents(rng, outdir):
    tbl = read("documents")
    texts = tbl.column("text").to_pylist()
    max_id = max(tbl.column("doc_id").to_pylist())
    rows = []
    next_id = max_id + 1
    # exact dup clique: one fixture doc x10
    clique_src = texts[rng.randrange(len(texts))]
    for _ in range(10):
        rows.append({"doc_id": next_id, "text": clique_src,
                     "lang": "en", "source": "fz_clique",
                     "n_chars": len(clique_src)})
        next_id += 1
    # near-dups: single-token perturbations of another doc
    base = texts[rng.randrange(len(texts))]
    toks = base.split(" ")
    for _ in range(6):
        t2 = list(toks)
        if t2:
            t2[rng.randrange(len(t2))] = "fzperturb%d" % rng.randrange(100)
        s = " ".join(t2)
        rows.append({"doc_id": next_id, "text": s, "lang": "en",
                     "source": "fz_near", "n_chars": len(s)})
        next_id += 1
    for s in UNICODE_DOCS:
        rows.append({"doc_id": next_id, "text": s, "lang": "xx",
                     "source": "fz_unicode", "n_chars": len(s)})
        next_id += 1
    write(outdir, "documents", append_rows(tbl, rows))


def fuzz_embeddings(rng, outdir):
    tbl = read("embeddings")
    vecs = tbl.column("embedding").to_pylist()
    dim = len(vecs[0])
    max_id = max(tbl.column("vec_id").to_pylist())
    rows = []
    next_id = max_id + 1
    # exact-dup vector clique (8 ids, one vector) — dupGroups path
    shared = vecs[rng.randrange(len(vecs))]
    for _ in range(8):
        rows.append({"vec_id": next_id, "embedding": shared, "label": 7})
        next_id += 1
    # quantize-boundary vectors: components at (k+0.5)/127 so
    # round(x*127) sits exactly on .5 (float32 rounding of the
    # component applies first on BOTH engines — same value)
    for _ in range(6):
        v = [((rng.randrange(-126, 126) + 0.5) / 127.0) for _ in range(dim)]
        rows.append({"vec_id": next_id, "embedding": v, "label": 8})
        next_id += 1
    write(outdir, "embeddings", append_rows(tbl, rows))


def fuzz_events(rng, outdir):
    tbl = read("events")
    vals = list(tbl.column("value").to_pylist())
    props = list(tbl.column("props").to_pylist())
    ts = tbl.column("ts").to_pylist()
    users = tbl.column("user_id").to_pylist()
    n = len(vals)
    for i in range(n):
        if rng.random() < 0.30:
            vals[i] = lattice(rng, 0, 500)
        if rng.random() < 0.10:
            props[i] = None
    tbl = rebuild(tbl, {"value": vals, "props": props})
    # timestamp ties: 40 extra events of one user on ONE instant
    max_id = max(tbl.column("event_id").to_pylist())
    tie_user = users[rng.randrange(n)]
    tie_ts = ts[rng.randrange(n)]
    rows = []
    for j in range(40):
        rows.append({"event_id": max_id + 1 + j, "ts": tie_ts,
                     "user_id": tie_user, "event_type": "fz_tie",
                     "value": lattice(rng, 0, 100), "props": None})
    # a brand-new single-event user (cohort of exactly 1)
    rows.append({"event_id": max_id + 100, "ts": ts[0],
                 "user_id": max(users) + 1, "event_type": "fz_solo",
                 "value": 1.0, "props": None})
    # r15 widening (VERDICT ask 9): a zscore-window cancellation probe —
    # one user, 30 events, large common offset + small lattice
    # deviations, so the window stddev exercises the engines' internal
    # variance accumulation exactly like the lineitem probe
    zuser = max(users) + 2
    for j in range(30):
        rows.append({"event_id": max_id + 200 + j,
                     "ts": ts[j % len(ts)],
                     "user_id": zuser, "event_type": "fz_cancel",
                     "value": 2.0e4 + lattice(rng, 0, 10), "props": None})
    # --- r16 widening (VERDICT r15 ask 8): timestamp/timezone
    # boundary domains. The corpus ts is timestamp[us]; pyarrow rows
    # carry datetime objects through the original schema. ---
    import datetime as dt
    # (a) calendar-truncation instants: month end last-µs / month
    # start, leap day (2024), year boundary ± 1 µs, the two US DST
    # transition instants expressed in UTC (both engines run UTC — the
    # probe proves date_trunc/cohort arithmetic is TZ-rule-free), and
    # the epoch itself ± 1 µs (negative-µs pre-epoch value)
    boundary_instants = [
        dt.datetime(2024, 1, 31, 23, 59, 59, 999999),
        dt.datetime(2024, 2, 1, 0, 0, 0, 0),
        dt.datetime(2024, 2, 29, 0, 0, 0, 0),
        dt.datetime(2024, 2, 29, 23, 59, 59, 999999),
        dt.datetime(2024, 3, 1, 0, 0, 0, 0),
        dt.datetime(2024, 3, 10, 7, 0, 0, 0),   # US spring-forward (UTC)
        dt.datetime(2024, 11, 3, 6, 0, 0, 0),   # US fall-back (UTC)
        dt.datetime(2023, 12, 31, 23, 59, 59, 999999),
        dt.datetime(2024, 1, 1, 0, 0, 0, 0),
        dt.datetime(1969, 12, 31, 23, 59, 59, 999999),  # pre-epoch
        dt.datetime(1970, 1, 1, 0, 0, 0, 0),            # epoch zero
    ]
    assert len(boundary_instants) >= 10, (
        f"boundary-instant probe under-populated: {len(boundary_instants)}")
    buser = max(users) + 3
    for j, b in enumerate(boundary_instants):
        rows.append({"event_id": max_id + 300 + j, "ts": b,
                     "user_id": buser,
                     "event_type": "view" if j % 2 == 0 else "click",
                     "value": lattice(rng, 0, 100), "props": None})
    # (b) session-gap == threshold: consecutive deltas of exactly
    # 30 min (the >= 1_800_000_000 µs cut fires), 30 min − 1 µs (same
    # session), 30 min + 1 µs — the off-by-one domain of every
    # sessionizer/gap-island/gap-fill consumer
    guser = max(users) + 4
    gap_deltas = [0, 1800000000, 1799999999, 1800000001]
    gap_types = ["view", "click", "purchase", "view"]
    assert len(gap_deltas) == len(gap_types) >= 4
    cur = dt.datetime(2024, 1, 10, 12, 0, 0, 0)
    for j, (dus, et) in enumerate(zip(gap_deltas, gap_types)):
        cur = cur + dt.timedelta(microseconds=dus)
        rows.append({"event_id": max_id + 400 + j, "ts": cur,
                     "user_id": guser, "event_type": et,
                     "value": lattice(rng, 0, 100), "props": None})
    # (c) as-of tolerance edges: one purchase, clicks at Δ = 0 (equal
    # ts — the backward <= edge), −1 µs, +2 h exactly (the forward <=
    # band edge), +2 h + 1 µs (just outside), −2 h exactly
    auser = max(users) + 5
    p0 = dt.datetime(2024, 1, 15, 12, 0, 0, 0)
    rows.append({"event_id": max_id + 500, "ts": p0, "user_id": auser,
                 "event_type": "purchase", "value": 1.0, "props": None})
    asof_deltas = [0, -1, 7200000000, 7200000001, -7200000000]
    assert len(asof_deltas) >= 5
    for j, dus in enumerate(asof_deltas):
        rows.append({"event_id": max_id + 501 + j,
                     "ts": p0 + dt.timedelta(microseconds=dus),
                     "user_id": auser, "event_type": "click",
                     "value": lattice(rng, 0, 100), "props": None})
    write(outdir, "events", append_rows(tbl, rows))


def fuzz_supplier(rng, outdir):
    tbl = read("supplier")
    bal = list(tbl.column("s_acctbal").to_pylist())
    for i in range(len(bal)):
        if rng.random() < 0.5:
            bal[i] = lattice(rng, -999, 9999)
    write(outdir, "supplier", rebuild(tbl, {"s_acctbal": bal}))


def main():
    if "--entries" in sys.argv:
        print(" ".join(ENTRIES))
        return
    outdir = sys.argv[1]
    seed = 14
    if "--seed" in sys.argv:
        seed = int(sys.argv[sys.argv.index("--seed") + 1])
    global BASE_DIR
    BASE_DIR = BASE
    if "--base" in sys.argv:
        BASE_DIR = sys.argv[sys.argv.index("--base") + 1]
    rng = random.Random(seed)
    os.makedirs(outdir, exist_ok=True)
    # untouched tables: straight copies (schema + values)
    for t in ("region", "nation", "part"):
        write(outdir, t, read(t))
    fuzz_supplier(rng, outdir)
    fuzz_customer(rng, outdir)
    fuzz_orders(rng, outdir)
    fuzz_lineitem(rng, outdir)
    fuzz_documents(rng, outdir)
    fuzz_embeddings(rng, outdir)
    fuzz_events(rng, outdir)
    print(f"fuzz corpus written to {outdir} (seed={seed}, base={BASE_DIR})")
    print("sweep entries:", len(ENTRIES))


if __name__ == "__main__":
    main()
