package graft

import org.apache.spark.sql.SparkSession

/** Prints formatted physical plans for the headline queries so plan
  * regressions (lost pushdown, missed broadcast, surprise shuffles)
  * are visible. Run: sbt "Test/runMain graft.PlanAudit [sfDir]"
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val interesting = Seq("q01_filter_project", "q02_tpch_q1_agg", "q03_broadcast_join",
      "q04_multi_join", "q06_window_topk", "q14_cosine_topk", "q15_time_window",
      "q18_neardup_lsh",
      "q23_ann_lsh", "q28_asof_join", "q29_session_window", "q30_cube",
      "q32_range_join", "q43_sliding_window",
      "q35_window_frames", "q36_topk_agg", "q37_ann_ivf", "q40_percentile",
      "q44_jaccard_neardup", "q45_pivot", "q47_approx_sketches",
      "q64_seq_packing", "q69_line_dedup", "q70_upsample", "q71_chunk_windows",
      "q48_outer_join", "q49_setops_all",
      "q82_domain_cap", "q83_bm25_score", "q84_gopher_filter", "q85_top_ngrams",
      "q86_char_entropy", "q88_bloom_gate",
      "q96_url_parse", "q97_html_extract", "q99_url_normalize", "q100_cdc_parts",
      "q101_http_payload", "q102_url_sortquery", "q103_http_convert",
      "q104_charset_decode", "q105_main_content", "q106_freq_items",
      "q107_link_graph", "q108_pagerank", "q109_robots_gate",
      "q110_audio_decode", "q111_sitemap", "q112_frontier", "q113_cdx_keys",
      "q114_robots_sitemaps", "q115_html_meta", "q116_anchor_text",
      "q117_nofollow_rank", "q118_script_mix", "q119_crawl_delay",
      "q120_warc_cdx", "q121_fetch_schedule", "q122_warc_wet",
      "q123_image_decode", "q124_site_clusters", "q125_cdx_scan",
      "q126_bpe_tokens", "q127_pii_redact", "q128_leakfree_split",
      "q129_ann_pq", "q130_token_budget", "q131_incr_neardup",
      "q132_ann_ivfpq", "q133_data_card", "q134_fix_mojibake",
      "q135_ann_atrest", "q136_snapshot_diff", "q137_corpus_select")
    interesting.foreach { name =>
      println(s"\n===== $name =====")
      SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
