#!/usr/bin/env python3
"""Scale the sf0.1 test tables by an integer factor for the scale-proof
bench (BENCH_SF1.md): the driver only ships sf{0.001,0.01,0.1}, and the
100 TB story needs at least one measured decade above the graded scale.

Replication semantics (deterministic, no RNG):
  - events: FACTOR copies; user_id/event_id shift by k*(max+1) per copy k
    so the record count scales 10x with the same per-record length
    distribution (the shape record-parallel operators care about).
    Replicated with pyarrow, NOT DuckDB: the source ts column is
    timestamp[ns], which Spark reads as LONG nanos under the
    nanosAsLong flag every graft session sets — DuckDB's parquet
    writer silently coerces it to timestamp[us], which Spark then
    reads as TIMESTAMP_NTZ and every `ts div 1000` query breaks at
    the scaled SF only. The scaled table must be schema-identical
    (ns ts, props column, field order) to measure the same workload.
  - documents: doc_id shifts; copy k's text is letter-rotated by k
    (a->b->c...) so copies are NOT cross-copy near-duplicates — naive
    replication would turn every doc into a 10-clique and inflate the
    LSH-bucket pair count ~100x, which is a different workload, not a
    bigger one. Within-copy dup structure is preserved exactly.
  - embeddings: vec_id shifts; copy k applies a deterministic coordinate
    PERMUTATION (affine index map i -> a_k*i + k mod dim, a_k coprime to
    dim). A permutation preserves every norm and every within-copy cosine
    EXACTLY (the pair set per copy is the sf0.1 pair set), and it kills
    the near-IDENTITY the previous +k*0.001 shift manufactured (10 copies
    of each vector at cos ~ 0.99997 = 90k fake pairs at factor 10).
    What it deliberately does NOT do is suppress cross-copy pairs below
    the distribution's own tail rate — that is impossible and would be
    wrong: the sf0.1 embeddings are unclustered (cosine ~ N(0, 1/sqrt(64)),
    ground-truth P(cos >= 0.4) = 4.6e-4 over all 2M pairs), so a GENUINE
    10x i.i.d. corpus has ~rate*C(20000,2) ~ 92k pairs — quadratic in n by
    the nature of a fixed-threshold query on unclustered data. Measured at
    factor 10: permuted cross-copy rate 5.0e-4 (~= the i.i.d. rate, vs the
    shift's concentrated-at-1 spike), ground-truth total ~99k (~= the
    92k a fresh corpus would have), LSH-realized output 45,324 vs 411 at
    sf0.1 with recall stable at 45-46% on both scales (LCG-plane
    vintage; the md5 planes that replaced them realize ~50k/52% —
    BENCH_SF1 "Auto-granularity A/B"). I.e. the scaled
    workload now IS the workload of a 10x corpus, and time-vs-output is
    the right scaling read for dedup_cosine.
  - remaining tables (lineitem, orders, ...) are copied unchanged — no
    heavy query reads them, and graft.Verify needs them present to run
    the full query set (tree/centroid/model oracle exports at this SF).

Usage: python3 tools/make_sfN.py <srcdir> <outdir> <factor>
       [--tpch] [--events-only | --docs-only]

--events-only writes ONLY the scaled events.parquet — the third-decade
fixture for events-table-only rows (events_retention's 100M-event read)
without paying documents/embeddings replication or disk for tables the
row never touches. --docs-only is the documents.parquet twin (the
url_*/text_* decade fixture), --lineitem-only the lineitem.parquet one
(the profile_table decade fixture; key columns shift per copy).
"""
import sys, os, shutil, string
import duckdb


def rot_expr(col, k):
    # Per-copy injective letter substitution: affine map x -> a*x + b mod 26
    # with a coprime to 26. Pure rotation (a=1) repeats every 26 copies —
    # at factor > 26, copies k and k+26 would carry IDENTICAL text and
    # manufacture cross-copy exact-dup cliques (the same workload
    # corruption the embedding shift had). The affine family gives 312
    # distinct permutations; copies 1..25 keep a=1 so factor <= 26 output
    # (the sf1 grid) is bit-identical to the old rotation.
    if k == 0:
        return col
    coprimes = [1, 3, 5, 7, 9, 11, 15, 17, 19, 21, 23, 25]
    a = coprimes[(k // 26) % len(coprimes)]
    b = k % 26
    lower = string.ascii_lowercase
    upper = string.ascii_uppercase
    src = lower + upper
    perm = [(a * i + b) % 26 for i in range(26)]
    dst = "".join(lower[p] for p in perm) + "".join(upper[p] for p in perm)
    return f"translate({col}, '{src}', '{dst}')"


def write_embeddings(con, src, out, factor):
    em = f"read_parquet('{src}/embeddings.parquet')"
    v_shift = con.sql(f"SELECT max(vec_id) + 1 FROM {em}").fetchone()[0]
    dim = con.sql(f"SELECT len(embedding) FROM {em} LIMIT 1").fetchone()[0]
    cols = [c for c in con.sql(f"SELECT * FROM {em} LIMIT 0").columns
            if c not in ("vec_id", "embedding")]
    extra = (", " + ", ".join(cols)) if cols else ""

    def perm_expr(k):
        # copy 0 is the identity (originals preserved bit-for-bit); copy k
        # permutes coordinates by i -> a_k*i + k (mod dim), a bijection
        # because gcd(a_k, dim) = 1
        if k == 0:
            return "embedding"
        import math
        a = k + 2
        while math.gcd(a, dim) != 1:
            a += 1
        return (f"list_transform(range(1, {dim} + 1),"
                f" i -> embedding[(({a} * (i - 1) + {k % dim}) % {dim}) + 1])")

    arms = "\nUNION ALL\n".join(
        f"SELECT vec_id + {k * v_shift} AS vec_id,"
        f" {perm_expr(k)} AS embedding"
        f"{extra} FROM {em}" for k in range(factor))
    con.execute(f"COPY ({arms}) TO '{out}/embeddings.parquet' (FORMAT PARQUET)")


def main():
    src, out, factor = sys.argv[1], sys.argv[2], int(sys.argv[3])
    # --events-only/--docs-only early-return before the --tpch branch and
    # the plain-table copies, so combining them with --tpch would silently
    # ignore --tpch; reject the combination loudly instead of half-obeying
    only = [f for f in ("--events-only", "--docs-only", "--lineitem-only",
                        "--embeddings-only")
            if f in sys.argv]
    if len(only) > 1 or (only and "--tpch" in sys.argv):
        sys.exit(f"make_sfN.py: {' + '.join(only + ['--tpch'] if '--tpch' in sys.argv else only)} "
                 "are mutually exclusive (the *-only fixtures write a single table)")
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")

    if "--lineitem-only" in sys.argv:
        # the profile_table decade fixture: key columns shift per copy
        # (distinct counts genuinely scale), value columns replicate
        # (bounded domains stay bounded — the real wide-table shape)
        lc0 = f"read_parquet('{src}/lineitem.parquet')"
        ok_shift0 = con.sql(f"SELECT max(l_orderkey) + 1 FROM {lc0}").fetchone()[0]
        pk_shift0 = con.sql(f"SELECT max(l_partkey) + 1 FROM {lc0}").fetchone()[0]
        l_cols0 = [c for c in con.sql(f"SELECT * FROM {lc0} LIMIT 0").columns
                   if c not in ("l_orderkey", "l_partkey")]
        l_extra0 = (", " + ", ".join(l_cols0)) if l_cols0 else ""
        arms0 = "\nUNION ALL\n".join(
            f"SELECT l_orderkey + {k * ok_shift0} AS l_orderkey,"
            f" l_partkey + {k * pk_shift0} AS l_partkey{l_extra0} FROM {lc0}"
            for k in range(factor))
        con.execute(f"COPY ({arms0}) TO '{out}/lineitem.parquet' (FORMAT PARQUET)")
        n = con.sql(f"SELECT count(*) FROM read_parquet('{out}/lineitem.parquet')").fetchone()[0]
        print(f"lineitem: {n} rows")
        return

    if "--embeddings-only" in sys.argv:
        # the ANN decade fixture (ann_probe_auto's ×100 race) without
        # paying events/documents replication for tables the row never
        # touches; identical permutation semantics to the full path below
        write_embeddings(con, src, out, factor)
        return

    if "--docs-only" in sys.argv:
        dc0 = f"read_parquet('{src}/documents.parquet')"
        d_shift0 = con.sql(f"SELECT max(doc_id) + 1 FROM {dc0}").fetchone()[0]
        arms0 = "\nUNION ALL\n".join(
            f"SELECT doc_id + {k * d_shift0} AS doc_id, {rot_expr('text', k)} AS text,"
            f" lang, source, n_chars FROM {dc0}" for k in range(factor))
        con.execute(f"COPY ({arms0}) TO '{out}/documents.parquet' (FORMAT PARQUET)")
        return

    # events via pyarrow (schema fidelity — see module docstring); one
    # copy per row group so factor-100 output streams, never materializes
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    evt = pq.read_table(f"{src}/events.parquet")
    u_shift = pc.max(evt.column("user_id")).as_py() + 1
    e_shift = pc.max(evt.column("event_id")).as_py() + 1
    with pq.ParquetWriter(f"{out}/events.parquet", evt.schema) as w:
        for k in range(factor):
            if k == 0:
                w.write_table(evt)
                continue
            cols = []
            for name in evt.schema.names:
                col = evt.column(name)
                if name == "user_id":
                    col = pc.add(col, pa.scalar(k * u_shift, type=pa.int64()))
                elif name == "event_id":
                    col = pc.add(col, pa.scalar(k * e_shift, type=pa.int64()))
                cols.append(col)
            w.write_table(pa.table(cols, schema=evt.schema))

    if "--events-only" in sys.argv:
        return

    dc = f"read_parquet('{src}/documents.parquet')"
    d_shift = con.sql(f"SELECT max(doc_id) + 1 FROM {dc}").fetchone()[0]
    arms = "\nUNION ALL\n".join(
        f"SELECT doc_id + {k * d_shift} AS doc_id, {rot_expr('text', k)} AS text,"
        f" lang, source, n_chars FROM {dc}" for k in range(factor))
    con.execute(f"COPY ({arms}) TO '{out}/documents.parquet' (FORMAT PARQUET)")

    write_embeddings(con, src, out, factor)

    # --tpch: ALSO scale orders + lineitem (factor copies with shifted
    # keys) so the graph fixtures (co-purchase triangles, k-core, the
    # hub-star row) get a REAL decade instead of the default stable
    # fixture. Key shifts keep copies disjoint (o_orderkey, o_custkey,
    # l_orderkey, l_partkey all shift per copy) — degrees are preserved
    # within each copy, the edge count scales by the factor, and the
    # hub-star row's hubs (o_orderkey % 8) stay SHARED across copies so
    # hub degree genuinely scales. Default off: the published grids for
    # lineitem-based rows were measured on the unscaled fixture and stay
    # comparable.
    scale_tpch = "--tpch" in sys.argv
    plain = "region nation customer supplier part".split()
    if not scale_tpch:
        plain += ["orders", "lineitem"]
    for t in plain:
        p = f"{src}/{t}.parquet"
        if os.path.exists(p):
            shutil.copy(p, f"{out}/{t}.parquet")
    if scale_tpch:
        oc = f"read_parquet('{src}/orders.parquet')"
        ok_shift = con.sql(f"SELECT max(o_orderkey) + 1 FROM {oc}").fetchone()[0]
        ck_shift = con.sql(f"SELECT max(o_custkey) + 1 FROM {oc}").fetchone()[0]
        o_cols = [c for c in con.sql(f"SELECT * FROM {oc} LIMIT 0").columns
                  if c not in ("o_orderkey", "o_custkey")]
        o_extra = (", " + ", ".join(o_cols)) if o_cols else ""
        arms = "\nUNION ALL\n".join(
            f"SELECT o_orderkey + {k * ok_shift} AS o_orderkey,"
            f" o_custkey + {k * ck_shift} AS o_custkey{o_extra} FROM {oc}"
            for k in range(factor))
        con.execute(f"COPY ({arms}) TO '{out}/orders.parquet' (FORMAT PARQUET)")
        lc = f"read_parquet('{src}/lineitem.parquet')"
        pk_shift = con.sql(f"SELECT max(l_partkey) + 1 FROM {lc}").fetchone()[0]
        l_cols = [c for c in con.sql(f"SELECT * FROM {lc} LIMIT 0").columns
                  if c not in ("l_orderkey", "l_partkey")]
        l_extra = (", " + ", ".join(l_cols)) if l_cols else ""
        arms = "\nUNION ALL\n".join(
            f"SELECT l_orderkey + {k * ok_shift} AS l_orderkey,"
            f" l_partkey + {k * pk_shift} AS l_partkey{l_extra} FROM {lc}"
            for k in range(factor))
        con.execute(f"COPY ({arms}) TO '{out}/lineitem.parquet' (FORMAT PARQUET)")
    for t in "events documents embeddings".split():
        n = con.sql(f"SELECT count(*) FROM read_parquet('{out}/{t}.parquet')").fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()
