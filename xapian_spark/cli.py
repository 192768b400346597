"""Command-line tools — the xapian-quest / xapian-delve / xapian-compact
analogs (reference bin/xapian-*.cc), runnable via
``python -m xapian_spark.cli <cmd>`` or ``spark-submit --py-files``.

  index   <corpus.parquet> <index_dir> [--content-col C] [--id-col I]
          [--mode xapian|simple] [--stem en] [--stopword w]...
  search  <index_dir> "<query>" [-k N] [--percent] [--prune] [--stem en]
  delve   <index_dir> [--term T | --doc D | --stats | --allterms [PREFIX]
          | --termlist DOCID
          | --reconstruct DOCID [--prefix P] [--length N]
            [--start-pos S] [--end-pos E]]
  compact <segment_root> <out_dir>
  check   <index_dir>            (xapian-check analog: consistency fsck)
  suggest <index_dir> <word>
"""

from __future__ import annotations

import argparse
import json
import sys


def _spark():
    from .session import get_spark

    s = get_spark(app_name="xapian-spark-cli")
    s.sparkContext.setLogLevel("ERROR")
    return s


def cmd_index(args) -> int:
    from .operators.indexer import build_index
    from .sources.catalog import save_index

    spark = _spark()
    corpus = spark.read.parquet(args.corpus)
    ix = build_index(
        spark,
        corpus,
        id_col=args.id_col,
        content_col=args.content_col,
        meta_cols=args.meta or None,
        mode=args.mode,
        stem=args.stem,
        stopwords=frozenset(args.stopword) if args.stopword else None,
    )
    manifest = save_index(ix, args.index_dir)
    print(json.dumps({"snapshot": manifest["snapshot_id"], "stats": manifest["stats"]}))
    return 0


def cmd_search(args) -> int:
    from .operators.matcher import Matcher
    from .plans.parser import DEFAULT_FLAGS, FLAG_WILDCARD, QueryParser
    from .sources.catalog import load_index

    spark = _spark()
    ix = load_index(spark, args.index_dir)
    m = Matcher(spark, ix)
    parser = QueryParser(
        flags=DEFAULT_FLAGS | FLAG_WILDCARD,
        mode=ix.config.get("mode", "xapian"),
        stem=args.stem,
    )
    q = parser.parse_query(args.query)
    if args.prune:
        rows = m.mset_df(q, args.k, prune=True).collect()
        for i, r in enumerate(rows):
            print(f"{i + 1}\t{r['doc_id']}\t{r['weight']:.6f}")
    else:
        res = m.mset(q, maxitems=args.k, with_count=True, with_percent=args.percent)
        for r in res.df.collect():
            pct = f"\t{res.percents[r['doc_id']]}%" if args.percent else ""
            print(f"{r['rank']}\t{r['doc_id']}\t{r['weight']:.6f}{pct}")
        print(f"# matches: {res.matches}", file=sys.stderr)
    return 0


def cmd_delve(args) -> int:
    from pyspark.sql import functions as F

    from .operators.matcher import decode_blocks
    from .sources.catalog import load_index

    spark = _spark()
    ix = load_index(spark, args.index_dir)
    if args.stats or not (
        args.term
        or args.doc
        or args.allterms is not None
        or args.reconstruct is not None
        or args.termlist is not None
    ):
        print(json.dumps(ix.stats))
        print(json.dumps({"vocab": ix.dictionary.count(), "blocks": ix.postings.count()}))
    # --term/--allterms keep the old default of 10; --termlist prints the
    # complete list when -k is absent (xapian-delve parity, ADVICE r05)
    k_scan = args.k if args.k is not None else 10
    if args.term:
        d = ix.dictionary.filter(F.col("term") == args.term).collect()
        print(json.dumps([r.asDict() for r in d]))
        for r in (
            decode_blocks(ix.postings.filter(F.col("term") == args.term))
            .orderBy("doc_id")
            .limit(k_scan)
            .collect()
        ):
            print(f"{r['doc_id']}\twdf={r['wdf']}\tdoclen={r['doc_len']}")
    if args.doc:
        rows = ix.docs.filter(F.col("doc_id") == args.doc).collect()
        print(json.dumps([r.asDict() for r in rows], default=str))
    if args.allterms is not None:
        # allterms_begin(prefix) analog (include/xapian/database.h:283-306):
        # dictionary scan, startswith pushes down to the parquet scan
        d = ix.dictionary
        if args.allterms:
            d = d.filter(F.col("term").startswith(args.allterms))
        for r in d.orderBy("term").limit(k_scan).collect():
            print(f"{r['term']}\t{r['termfreq']}\t{r['collfreq']}")
    if args.termlist is not None:
        # termlist_begin(did) analog (include/xapian/database.h:211-223,
        # xapian-delve's -t with a docid): the doc's terms in term order
        # with wdf — block scan pruned by the docid-span metadata before
        # any decode, like matching_terms
        did = args.termlist
        # xapian-delve prints the COMPLETE termlist; -k limits only when
        # given explicitly (ADVICE r05: a silent default-10 truncation
        # diverged from the reference CLI), and a truncation is announced.
        tl = (
            decode_blocks(
                ix.postings.filter(
                    (F.col("first_docid") <= did)
                    & (F.col("last_docid") >= did)
                )
            )
            .filter(F.col("doc_id") == did)
            .orderBy("term")
        )
        k_given = args.k is not None
        rows = (tl.limit(args.k + 1) if k_given else tl).collect()
        shown = rows[: args.k] if k_given else rows
        for r in shown:
            print(f"{r['term']}\twdf={r['wdf']}")
        if k_given and len(rows) > args.k:
            print(f"... (truncated at -k {args.k})")
    if args.reconstruct is not None:
        # Database::reconstruct_text (database.h:918-941) — the 2.0 API a
        # delve user reaches for to see what a docid's indexed text was
        from .operators.matcher import reconstruct_text

        print(
            reconstruct_text(
                ix,
                args.reconstruct,
                length=args.length,
                prefix=args.prefix,
                start_pos=args.start_pos,
                end_pos=args.end_pos,
            )
        )
    return 0


def cmd_compact(args) -> int:
    from .streaming.freshness import compact

    spark = _spark()
    ix = compact(spark, args.segment_root, args.out_dir)
    print(json.dumps(ix.stats))
    return 0


def cmd_check(args) -> int:
    """xapian-check analog (bin/xapian-check.cc): cross-table consistency.

    The reference walks B-tree blocks; here every invariant is a
    distributed aggregation over the parquet tables — O(index) like the
    original, no driver materialization:
      1. block metadata sane (first ≤ last, n > 0);
      2. decoded contents match block metadata (row count, max_wdf,
         min_doclen, docid range);
      3. dictionary ≡ postings (termfreq = Σ n, collfreq = Σ wdf,
         wdf_max = max wdf);
      4. denormalized doclens ≡ docs table;
      5. stats ≡ docs table (doccount, total_length).
    Prints one JSON report; exit 1 on any failure."""
    from pyspark.sql import functions as F

    from .operators.matcher import decode_blocks
    from .sources.catalog import load_index

    spark = _spark()
    ix = load_index(spark, args.index_dir)
    report: dict = {}

    bad_meta = ix.postings.filter(
        (F.col("first_docid") > F.col("last_docid")) | (F.col("n") <= 0)
    ).count()
    report["block_metadata_bad"] = bad_meta

    dec = decode_blocks(ix.postings)
    # per-(term) aggregate of decoded postings vs dictionary
    agg = dec.groupBy("term").agg(
        F.count("*").alias("tf"),
        F.sum("wdf").cast("long").alias("cf"),
        F.max("wdf").alias("wmax"),
    )
    # null-safe (eqNullSafe): after the FULL join a term present on only one
    # side leaves the other side's columns NULL — a plain != evaluates to
    # NULL there and silently drops exactly the missing/extra-term
    # corruption this check exists to catch
    dic_bad = (
        agg.join(ix.dictionary, "term", "full")
        .filter(
            ~F.col("tf").eqNullSafe(F.col("termfreq"))
            | ~F.col("cf").eqNullSafe(F.col("collfreq"))
            | ~F.col("wmax").eqNullSafe(F.col("wdf_max"))
        )
        .count()
    )
    report["dictionary_mismatch_terms"] = dic_bad

    # block-level metadata vs contents
    blk = dec.groupBy("term").agg(F.count("*").alias("nn"))  # decoded per term
    meta_rows = ix.postings.groupBy("term").agg(F.sum("n").alias("n_meta"))
    blk_bad = (
        blk.join(meta_rows, "term", "full")
        .filter(~F.col("nn").eqNullSafe(F.col("n_meta")))
        .count()
    )
    report["block_content_count_mismatch_terms"] = blk_bad

    # denormalized doclen agreement with the docs table — FULL join so a
    # posting doc missing from the docs table (or vice versa for docs that
    # SHOULD have postings) surfaces as a NULL-side mismatch instead of
    # being dropped by an inner join; docs with doc_len=0 legitimately have
    # no postings, so the docs-only side only flags rows with doc_len > 0
    dl_bad = (
        dec.select("doc_id", "doc_len")
        .distinct()
        .join(
            ix.docs.select("doc_id", F.col("doc_len").alias("dl2")),
            "doc_id",
            "full",
        )
        .filter(
            ~F.col("doc_len").eqNullSafe(F.col("dl2"))
            & ~(F.col("doc_len").isNull() & (F.coalesce(F.col("dl2"), F.lit(0)) == 0))
        )
        .count()
    )
    report["doclen_mismatch_docs"] = dl_bad

    row = ix.docs.agg(
        F.count("*").alias("n"), F.sum("doc_len").alias("tl")
    ).collect()[0]
    report["doccount_matches"] = int(row["n"]) == ix.stats["doccount"]
    report["total_length_matches"] = int(row["tl"] or 0) == ix.stats["total_length"]

    ok = (
        bad_meta == 0
        and dic_bad == 0
        and blk_bad == 0
        and dl_bad == 0
        and report["doccount_matches"]
        and report["total_length_matches"]
    )
    report["ok"] = ok
    print(json.dumps(report))
    return 0 if ok else 1


def cmd_suggest(args) -> int:
    from .operators.spelling import suggest
    from .sources.catalog import load_index

    spark = _spark()
    ix = load_index(spark, args.index_dir)
    print(suggest(spark, ix, args.word) or "")
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="xapian_spark.cli")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("index")
    p.add_argument("corpus")
    p.add_argument("index_dir")
    p.add_argument("--content-col", default="content")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--mode", default="xapian")
    p.add_argument("--stem", default=None)
    p.add_argument("--stopword", action="append")
    p.add_argument("--meta", action="append")
    p.set_defaults(fn=cmd_index)

    p = sub.add_parser("search")
    p.add_argument("index_dir")
    p.add_argument("query")
    p.add_argument("-k", type=int, default=10)
    p.add_argument("--percent", action="store_true")
    p.add_argument("--prune", action="store_true")
    p.add_argument("--stem", default=None)
    p.set_defaults(fn=cmd_search)

    p = sub.add_parser("delve")
    p.add_argument("index_dir")
    p.add_argument("--term")
    p.add_argument("--doc", type=int)
    p.add_argument("--stats", action="store_true")
    p.add_argument("--reconstruct", type=int, metavar="DOCID")
    p.add_argument(
        "--termlist", type=int, default=None, metavar="DOCID",
        help="the doc's terms with wdf, term order (termlist_begin)",
    )
    p.add_argument("--prefix", default="")
    p.add_argument("--length", type=int, default=0)
    p.add_argument("--start-pos", type=int, default=0)
    p.add_argument("--end-pos", type=int, default=0)
    p.add_argument(
        "--allterms", nargs="?", const="", default=None,
        help="dictionary scan, optionally by prefix (allterms_begin)",
    )
    # default None: --termlist prints the COMPLETE list unless -k is given
    # (xapian-delve parity); --term/--allterms fall back to 10
    p.add_argument("-k", type=int, default=None)
    p.set_defaults(fn=cmd_delve)

    p = sub.add_parser("compact")
    p.add_argument("segment_root")
    p.add_argument("out_dir")
    p.set_defaults(fn=cmd_compact)

    p = sub.add_parser("check")
    p.add_argument("index_dir")
    p.set_defaults(fn=cmd_check)

    p = sub.add_parser("suggest")
    p.add_argument("index_dir")
    p.add_argument("word")
    p.set_defaults(fn=cmd_suggest)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
