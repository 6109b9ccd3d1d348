"""r16 experiment (VERDICT r15 item 6): would a (token, doc_id)-sorted
COMPANION copy of the bootstrap postings let the MaxScore split's
phase B (and the cascade->MaxSim rerank) row-group-prune its candidate
fetch, instead of scanning the dense terms' bytes once?

Method: run the real mixed split at 1M, capture the REAL candidate doc
set, then simulate the companion layout exactly — postings of each
dense term sorted by doc_id, cut into row groups of the SAME row count
the real writer produces (measured from the live parquet footers) —
and count the fraction of groups whose [min, max] doc_id stats admit
at least one candidate.  That fraction IS the bytes a stats-aware
reader would touch under the companion; 1.0 means the companion buys
nothing and the decision is DECLINE.

Run:  SPARK_GRAFT_DRIVER_MEM=4g python examples/exp_phaseb_companion_r16.py
"""
import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main() -> None:
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from binaryvectordb_spark.operators.textindex import TextIndex
    from binaryvectordb_spark.queries.hybrid import TERMS
    from binaryvectordb_spark.session import get_spark
    from binaryvectordb_spark.sources.tables import replicated_text_corpus

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("exp-phaseb")
    spark.sparkContext.setLogLevel("ERROR")

    out: dict = {}
    d = tempfile.mkdtemp(prefix="bvdb_exp_phb_")
    try:
        # the bench's own 1M corpus builder — shared so the decline
        # decision this script evidences holds for the measured keys
        big = replicated_text_corpus(spark, sf_dir,
                                     os.path.join(d, "corpus"))
        idx = TextIndex(spark, os.path.join(d, "ti")).build(big)

        # the bench's mixed split shape: selective anchor + 2 dense
        split_terms = ("tag7", TERMS[0], TERMS[1])
        idx.search(split_terms, k=10, block_max=True).collect()
        info = idx.last_blockmax
        out["mode"] = info.get("mode")
        out["n_candidates"] = info.get("n_candidates")
        assert info.get("mode") == "maxscore", info

        # re-derive the candidate ids exactly as the split does (same
        # essential read + cut) so the simulation uses the REAL set
        base = idx.spark.read.schema(
            "token string, doc_id long, imp double").parquet(
            os.path.join(idx.folder, idx.meta["segments"][0], "postings"))
        stats = idx._term_stats_lookup(list(split_terms))
        n_docs = float(idx._meta_n_docs())
        idf = {t: ((n_docs - stats[t][0]) + 0.5) / (stats[t][0] + 0.5)
               for t in split_terms if t in stats}
        ess = [t for t in split_terms
               if stats[t][0] <= idx._ESSENTIAL_FRAC * max(1.0, n_docs)]
        dense = [t for t in split_terms if t not in ess]
        slack = sum(idx._dense_seen_ub(t, stats, idf[t], 1.0, False,
                                       False) for t in dense)
        s_case_e = ("CAST(floor((CASE token " + " ".join(
            f"WHEN '{idx._sql_str(t)}' THEN {idf[t]!r}D" for t in ess)
            + " ELSE 0.0D END) * imp * 1e10) AS BIGINT)")
        g_e = (base.where(F.col("token").isin(*ess))
               .select("doc_id", F.expr(s_case_e).alias("s"))
               .groupBy("doc_id").agg(F.sum("s").alias("pe")))
        top_e = (g_e.orderBy(F.desc("pe"), F.asc("doc_id"))
                 .limit(10).collect())
        theta_e = int(top_e[-1]["pe"])
        cand = (g_e.where(F.col("pe") >= theta_e - slack)
                .select("doc_id").collect())
        ids = sorted(int(r["doc_id"]) for r in cand)
        out["n_candidates_rederived"] = len(ids)

        # measured writer geometry: rows per row group in the REAL
        # postings files (the companion would use the same writer)
        pdir = os.path.join(idx.folder, idx.meta["segments"][0],
                            "postings")
        rg_rows = []
        for fname in sorted(os.listdir(pdir)):
            if not fname.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(pdir, fname)).metadata
            for i in range(md.num_row_groups):
                rg_rows.append(md.row_group(i).num_rows)
        out["rg_count_real"] = len(rg_rows)
        out["rg_rows_median"] = sorted(rg_rows)[len(rg_rows) // 2]
        R = max(1, out["rg_rows_median"])

        # simulate the companion: per dense term, postings sorted by
        # doc_id, cut into groups of R rows; group hit iff it contains
        # a candidate (doc_id-sorted => [min,max] stats are tight)
        from pyspark.sql import Window
        cand_df = spark.createDataFrame([(i,) for i in ids],
                                        "doc_id long")
        sim = {}
        tot_groups = tot_hit = 0
        for t in dense:
            w = Window.partitionBy("token").orderBy("doc_id")
            pt = (base.where(F.col("token") == t)
                  .select("token", "doc_id")
                  .withColumn("rn", F.row_number().over(w))
                  .withColumn("grp", ((F.col("rn") - 1) /
                                      F.lit(R)).cast("long")))
            n_t = pt.count()
            n_groups = (n_t + R - 1) // R
            hit = (pt.join(F.broadcast(cand_df), "doc_id", "left_semi")
                   .select("grp").distinct().count())
            sim[t] = {"postings": n_t, "groups": n_groups,
                      "groups_hit": hit,
                      "fraction": round(hit / max(1, n_groups), 4)}
            tot_groups += n_groups
            tot_hit += hit
        out["companion_sim"] = sim
        out["companion_fraction_overall"] = round(
            tot_hit / max(1, tot_groups), 4)

        # the break-even: groups must outnumber candidates for pruning
        # to bite — report the row-group size that WOULD give 50% skip
        # at this candidate count (uniform-scatter approximation)
        out["note_break_even_R"] = int(
            max(1, min(r["postings"] for r in sim.values())
                / max(1, 1.44 * len(ids))))

        print(json.dumps(out))
    finally:
        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
