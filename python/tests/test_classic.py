#!/usr/bin/env python3
"""End-to-end test of the CLASSIC (py4j) graft client against a real
local pyspark session with the compiled graft classes on the driver
classpath. Run from the repo root after `sbt compile`:

    python3 python/tests/test_classic.py

Prints one `CLASSIC OK <check>` line per passing check and exits 0;
any failure raises. Driven by scalatest's ClassicPythonSpec.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import SparkSession  # noqa: E402

# the packaged jar, not the classes dir: spark.jars is the path that
# resolves through py4j in every launch mode (build with `sbt package`)
JAR = os.environ.get(
    "GRAFT_JAR",
    os.path.join(os.path.dirname(__file__), "..", "..", "target",
                 "scala-2.13", "graphframesspark_2.13-0.1.0.jar"))
if not os.path.exists(JAR):
    raise SystemExit(f"graft jar not found at {JAR} — run `sbt package` first")

spark = (
    SparkSession.builder.master("local[4]")
    .appName("graft-classic-e2e")
    .config("spark.jars", os.path.abspath(JAR))
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from graft.classic import GraphFrame, Pipeline  # noqa: E402

# two triangles bridged by one edge — known structure for every check
edges = spark.createDataFrame(
    [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3), (2, 3)],
    ["src", "dst"])
vertices = spark.createDataFrame([(i,) for i in range(6)], ["id"])
g = GraphFrame(vertices, edges)

deg = {r["id"]: r["degree"] for r in g.degrees().collect()}
assert deg[2] == 3 and deg[3] == 3 and deg[0] == 2, deg
print("CLASSIC OK degrees")

pr = g.pageRank(maxIter=10).collect()
assert len(pr) == 6 and abs(sum(r["pagerank"] for r in pr) - 6.0) < 1e-6
print("CLASSIC OK page_rank")

tri = g.find("(a)-[e]->(b); (b)-[e2]->(c); (c)-[e3]->(a)").collect()
assert len(tri) == 6, len(tri)  # each triangle under 3 rotations
print("CLASSIC OK find")

cc = g.connectedComponents().collect()
assert len({r["component"] for r in cc}) == 1
print("CLASSIC OK connected_components")

ge = GraphFrame.fromEdges(edges)
assert ge.triangleCount().count() == 6
print("CLASSIC OK fromEdges/triangle_count")

# unknown parameter must raise loudly (server-side typed guard)
try:
    g.pageRank(maxIter=10**10)
    raise AssertionError("expected out-of-range maxIter to raise")
except Exception as e:  # noqa: BLE001
    assert "maxIter" in str(e)
print("CLASSIC OK typed_param_error")

docs = spark.createDataFrame(
    [(0, "the quick brown fox jumps over the lazy dog"),
     (1, "the quick brown fox jumps over the lazy dog"),
     (2, "a completely different document about spark pipelines")],
    ["doc_id", "text"])
dup = Pipeline(docs).nearDupClusters(idCol="doc_id", textCol="text").collect()
keep = {r["doc_id"]: r["keep_id"] for r in dup}
assert keep[0] == 0 and keep[1] == 0 and keep[2] == 2, keep
print("CLASSIC OK pipe_near_dup_clusters")

seg = Pipeline(docs).segmentDedup(
    idCol="doc_id", textCol="text", windowWords=3, maxDupCount=1).collect()
segmap = {r["doc_id"]: (r["kept"], r["dropped"]) for r in seg}
# docs 0 and 1 are identical -> all their 3-word windows are corpus dups
assert segmap[0] == (0, 3) and segmap[1] == (0, 3), segmap
assert segmap[2][1] == 0, segmap  # the unique doc keeps everything
print("CLASSIC OK pipe_segment_dedup")

emb = spark.createDataFrame(
    [(i, [float(i % 3 == 0), float(i % 3 == 1), float(i % 3 == 2)])
     for i in range(9)],
    ["vec_id", "embedding"])
ann = Pipeline(emb).annTopK(idCol="vec_id", vecCol="embedding", k=2).collect()
assert len(ann) == 18  # 9 queries x k=2
print("CLASSIC OK pipe_ann_topk")

bpe = Pipeline(docs).bpeTrain(textCol="text", numMerges=2).collect()
assert len(bpe) == 2 and bpe[0]["rank"] == 1
print("CLASSIC OK pipe_bpe_train")

imp = Pipeline(docs).importanceSample(
    idCol="doc_id", weightCol="doc_id", targetFraction=1.0).collect()
assert len(imp) == 2  # doc 0 has weight 0; docs 1..2 waterfill to p=1
print("CLASSIC OK pipe_importance_sample")

wsp_edges = spark.createDataFrame(
    [(0, 1, 10.0), (0, 2, 1.0), (2, 1, 1.0)], ["src", "dst", "w"])
wsp = GraphFrame(spark.createDataFrame([(i,) for i in range(3)], ["id"]),
                 wsp_edges)
d = {r["id"]: r["distances"] for r in
     wsp.shortestPaths(landmarks=[1], weightCol="w").collect()}
assert d[0][1] == 2.0, d  # 2-hop path beats the direct w=10 edge
print("CLASSIC OK weighted_shortest_paths")

hk = {r["id"]: (r["hub"], r["authority"]) for r in g.hits(maxIter=3).collect()}
assert abs(sum(h * h for h, _ in hk.values()) - 1.0) < 1e-9  # L2-unit hubs
print("CLASSIC OK hits")

kz = {r["id"]: r["katz"] for r in g.katz(maxIter=3, alpha=0.1).collect()}
assert all(v >= 1.0 for v in kz.values())
print("CLASSIC OK katz")

ch = Pipeline(docs).chunk(idCol="doc_id", textCol="text",
                          chunkWords=4, overlapWords=1).collect()
assert {r["doc_id"] for r in ch} == {0, 1, 2} and all(r["n_words"] <= 4 for r in ch)
print("CLASSIC OK pipe_chunk")

asof_l = spark.createDataFrame([(1, 10), (1, 30)], ["k", "ts"])
asof_r = spark.createDataFrame([(1, 5, 100), (1, 20, 200)], ["k", "ts", "rid"])
asof = {r["ts"]: r["asof_rid"] for r in
        Pipeline(asof_r).asofJoin(asof_l, on=["k"], leftTs="ts",
                                  rightTs="ts", rightCols=["rid"]).collect()}
assert asof == {10: 100, 30: 200}, asof
print("CLASSIC OK pipe_asof_join")

asof_f = {r["ts"]: r["next_rid"] for r in
          Pipeline(asof_r).asofJoin(asof_l, on=["k"], leftTs="ts",
                                    rightTs="ts", rightCols=["rid"],
                                    prefix="next_",
                                    direction="forward").collect()}
assert asof_f == {10: 200, 30: None}, asof_f  # earliest at-or-after
print("CLASSIC OK pipe_asof_forward")

bc = {r["id"]: r["betweenness"] for r in g.betweenness().collect()}
# unique shortest paths everywhere => exact integer pair counts
# (hand-enumerated): both bridge endpoints carry 7, their feeders 4
assert bc[2] == 7.0 and bc[3] == 7.0 and bc[1] == 4.0 and bc[0] == 1.0, bc
print("CLASSIC OK betweenness")

kt = [(r["src"], r["dst"], r["support"]) for r in g.kTruss(k=3).collect()]
assert len(kt) == 6 and all(s == 1 for _, _, s in kt), kt  # bridge drops
print("CLASSIC OK ktruss")

col = {r["id"]: r["color"] for r in g.greedyColoring(hashMode="md5").collect()}
for s, d in [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3), (2, 3)]:
    assert col[s] != col[d], col
print("CLASSIC OK greedy_coloring")

nf = {r["d"]: r["n_pairs"] for r in g.neighborhoodFunction().collect()}
# left triangle reaches all 6, right triangle only itself: 3*6 + 3*3
assert nf[0] == 6 and nf[max(nf)] == 27, nf
print("CLASSIC OK neighborhood_function")

n2v = g.randomWalks(walkLength=4, walksPerVertex=2,
                    returnParam=0.5, inOutParam=2.0).collect()
assert len(n2v) == 12 and all(len(r["random_walk"]) == 5 for r in n2v)
print("CLASSIC OK node2vec_walks")

cl = {r["id"]: (r["closeness"], r["harmonic"])
      for r in g.closeness(sampleK=3).collect()}
cl2 = {r["id"]: (r["closeness"], r["harmonic"])
       for r in g.closeness(sampleK=3).collect()}
assert len(cl) == 6 and cl == cl2  # md5 landmark draw: replayable
assert any(v[1] > 0 for v in cl.values())
print("CLASSIC OK closeness_sampled")

ecx = {r["id"]: r["eccentricity"] for r in g.eccentricity().collect()}
ecs = {r["id"]: r["eccentricity"] for r in g.eccentricity(sampleK=2).collect()}
assert set(ecs) == set(ecx) and all(ecs[i] <= ecx[i] for i in ecs)  # lower bound
print("CLASSIC OK eccentricity_sampled")

nb_docs = spark.createDataFrame(
    [(i, "apple banana cherry", "fruit") for i in range(20)] +
    [(i, "wrench hammer pliers", "tool") for i in range(20, 40)],
    ["doc_id", "text", "label"])
nb = Pipeline(nb_docs).nbClassifier(
    idCol="doc_id", textCol="text", labelCol="label").collect()
held = {r["doc_id"]: r["predicted"] for r in nb}
assert 0 < len(held) < 40  # md5 split leaves a held-out set
assert all(p == ("fruit" if d < 20 else "tool") for d, p in held.items()), held
print("CLASSIC OK pipe_nb_classifier")

lv = {r["id"]: r["community"] for r in g.louvain(maxIter=4).collect()}
assert len({lv[0], lv[1], lv[2]}) == 1 and len({lv[3], lv[4], lv[5]}) == 1
assert lv[0] != lv[3], lv  # one community per bridged triangle
q = g.modularity(maxIter=4).collect()[0]
assert abs(q["modularity"] - 70.0 / 196.0) < 1e-12 and q["n_communities"] == 2
print("CLASSIC OK louvain_modularity")

ev = {r["id"]: r["eigenvector"] for r in g.eigenvector(maxIter=10).collect()}
ev2 = {r["id"]: r["eigenvector"] for r in g.eigenvector(maxIter=10).collect()}
assert ev == ev2 and abs(max(ev.values()) - 1.0) < 1e-15
assert all(0.0 <= v <= 1.0 for v in ev.values()), ev
print("CLASSIC OK eigenvector")

mst_edges = spark.createDataFrame(
    [(0, 1, 10.0), (0, 2, 1.0), (2, 1, 1.0)], ["src", "dst", "w"])
mst_g = GraphFrame(spark.createDataFrame([(i,) for i in range(3)], ["id"]),
                   mst_edges)
mst = {(r["src"], r["dst"], r["weight"])
       for r in mst_g.minimumSpanningForest(weightCol="w").collect()}
assert mst == {(0, 2, 1.0), (1, 2, 1.0)}, mst  # the w=10 cycle edge drops
print("CLASSIC OK minimum_spanning_forest")

kg = {(r["src"], r["dst"])
      for r in Pipeline(emb).knnGraph(idCol="vec_id", vecCol="embedding",
                                      k=2).collect()}
# three one-hot classes of three identical vectors -> one triangle each
assert kg == {(0, 3), (0, 6), (3, 6), (1, 4), (1, 7), (4, 7),
              (2, 5), (2, 8), (5, 8)}, kg
print("CLASSIC OK pipe_knn_graph")

br = {(r["src"], r["dst"]): r["is_bridge"] for r in g.bridges().collect()}
assert br[(2, 3)] and sum(br.values()) == 1, br  # only the barbell bridge
ap = {r["id"]: r["is_articulation"] for r in g.articulationPoints().collect()}
assert {v for v, a in ap.items() if a} == {2, 3}, ap
tec = {r["id"]: r["component"] for r in g.twoEdgeComponents().collect()}
assert tec[0] == tec[1] == tec[2] == 0 and tec[3] == tec[4] == tec[5] == 3, tec
print("CLASSIC OK two_connectivity")

sl = {r["id"]: (r["hub"], r["authority"]) for r in g.salsa(maxIter=3).collect()}
assert abs(sum(h for h, _ in sl.values()) - 1.0) < 1e-12  # L1 hub mass
assert abs(sum(a for _, a in sl.values()) - 1.0) < 1e-12
print("CLASSIC OK salsa")

bf_edges = spark.createDataFrame(
    [(1, 10), (1, 11), (2, 10), (2, 11)], ["src", "dst"])
bf_g = GraphFrame(spark.createDataFrame([(i,) for i in range(3)], ["id"]),
                  bf_edges)
bf = bf_g.butterfly().collect()[0]
assert bf["n_butterflies"] == 1, bf  # K(2,2) is one butterfly
print("CLASSIC OK butterfly")

cont_docs = spark.createDataFrame(
    [(1, "one two three four five"),
     (2, "one two three four five " + " ".join(f"u{i}" for i in range(20)))],
    ["doc_id", "text"])
cp = {(r["a"], r["b"]): r["containment"]
      for r in Pipeline(cont_docs).containmentPairs(
          idCol="doc_id", textCol="text", threshold=0.5).collect()}
assert cp == {(1, 2): 1.0}, cp  # small-in-large direction only
print("CLASSIC OK pipe_containment")

tri = {(r["v1"], r["v2"], r["v3"]) for r in g.triangles().collect()}
assert tri == {(0, 1, 2), (3, 4, 5)}, tri  # one triangle per barbell end
assert g.cliques4().count() == 0  # no K4 anywhere in the barbell
print("CLASSIC OK triangles_cliques")

neg = [(r["src"], r["dst"]) for r in g.negativeSamples(k=2, seed=5).collect()]
eset = {(r["src"], r["dst"]) for r in g.edges.collect()}
assert neg and all((s, d) not in eset and (d, s) not in eset for s, d in neg), neg
print("CLASSIC OK negative_samples")

cms_df = spark.createDataFrame(
    [(i, "hot" if i % 2 == 0 else f"k{i}") for i in range(20)], ["id", "key"])
cms = Pipeline(cms_df).cmsTopK(keyCol="key", k=1, width=4096).collect()
assert cms[0]["key"] == "hot" and cms[0]["est"] == 10, cms
print("CLASSIC OK pipe_cms_topk")

basket_df = spark.createDataFrame(
    [(1, "a"), (1, "b"), (2, "a"), (2, "b"), (2, "c")], ["order_id", "item"])
ab = {(r["item"], r["also_bought"]): r["n_baskets"]
      for r in Pipeline(basket_df).alsoBought(
          basketCol="order_id", itemCol="item", k=1).collect()}
assert ab == {("a", "b"): 2, ("b", "a"): 2, ("c", "a"): 1}, ab
print("CLASSIC OK pipe_also_bought")

er_df = spark.createDataFrame(
    [(1, "acme corp"), (2, "acme c0rp"), (3, "zzz inc")], ["id", "name"])
er = [(r["id_a"], r["id_b"], r["dist"])
      for r in Pipeline(er_df).fuzzyPairs(
          idCol="id", textCol="name",
          blockExpr="substr(name, 1, 4)", maxDist=1).collect()]
assert er == [(1, 2, 1)], er
print("CLASSIC OK pipe_fuzzy_pairs")

mm = [(r["src"], r["dst"]) for r in g.maximalMatching(seed=7).collect()]
mv = [v for e in mm for v in e]
assert mm and len(set(mv)) == len(mv), mm  # a matching: no shared vertex
barbell = {(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3), (2, 3)}
matched = set(mv)
assert all(a in matched or b in matched for a, b in barbell), mm  # maximal
print("CLASSIC OK maximal_matching")

wedges = spark.createDataFrame(
    [(0, 1, 1.0), (1, 2, 5.0), (0, 2, 1.0)], ["src", "dst", "w"])
wg = GraphFrame(spark.createDataFrame([(i,) for i in range(3)], ["id"]),
                wedges)
wm = [(r["src"], r["dst"], r["weight"])
      for r in wg.maximalMatching(weightCol="w").collect()]
assert wm == [(1, 2, 5.0)], wm  # the dominant edge blocks the triangle
print("CLASSIC OK maximal_matching_weighted")

vor = {r["id"]: r["seed"] for r in g.voronoi(seeds=[0, 3]).collect()}
assert vor[4] == 3 and vor[5] == 3, vor  # right triangle drains to seed 3
print("CLASSIC OK voronoi")

split_df = spark.createDataFrame([(i,) for i in range(50)], ["doc_id"])
sp = {r["split"] for r in Pipeline(split_df).hashSplit(
    idCol="doc_id", fractions={"train": 0.8, "val": 0.1, "test": 0.1})
    .collect()}
assert sp.issubset({"train", "val", "test"}) and "train" in sp, sp
print("CLASSIC OK pipe_hash_split")

sh = [(r["shard"], r["pos"]) for r in Pipeline(split_df).shuffleShards(
    idCol="doc_id", numShards=4).collect()]
assert len(sh) == 50 and {s for s, _ in sh}.issubset(set(range(4))), sh[:5]
print("CLASSIC OK pipe_shuffle_shards")

erm = [(r["id_a"], r["id_b"]) for r in Pipeline(er_df).fuzzyPairs(
    idCol="id", textCol="name",
    blockExprs=["substr(name, 1, 4)", "length(name)"], maxDist=1).collect()]
assert erm == [(1, 2)], erm  # both keys propose it; ONE deduped row
print("CLASSIC OK pipe_fuzzy_pairs_multi")

dsir_df = spark.createDataFrame(
    [(1, "alpha beta " * 20, True), (2, "alpha beta " * 10, False),
     (3, "gamma delta " * 20, False)], ["doc_id", "text", "tgt"])
dw = {r["doc_id"]: r["log_weight"] for r in Pipeline(dsir_df).dsirWeights(
    idCol="doc_id", textCol="text", targetExpr="tgt", buckets=64).collect()}
assert dw[2] > dw[3], dw  # target-like raw doc outweighs off-target
print("CLASSIC OK pipe_dsir")

web_df = spark.createDataFrame(
    [(1, "<p>a &amp; b</p><script>x</script>",
      "HTTP://WWW.Ex.COM:80/a/?utm_source=s&b=2#f"),
     (2, "plain", "not a url")], ["doc_id", "html", "url"])
sm = {r["doc_id"]: (r["text"], r["n_tags"])
      for r in Pipeline(web_df).stripMarkup().collect()}
assert sm[1] == ("a & b", 4) and sm[2] == ("plain", 0), sm
print("CLASSIC OK pipe_strip_markup")

uc = {r["doc_id"]: (r["url_canon"], r["host"], r["url_key"])
      for r in Pipeline(web_df).urlCanonical().collect()}
assert uc[1] == ("http://www.ex.com/a?b=2", "ex.com", "ex.com/a?b=2"), uc
assert uc[2] == (None, None, None), uc
print("CLASSIC OK pipe_url_canonical")

hs = {r["host"]: (r["n_docs"], r["n_pages"]) for r in Pipeline(
    web_df).hostStats().collect()}
assert hs == {"ex.com": (1, 1)}, hs  # the non-URL row drops
print("CLASSIC OK pipe_host_stats")

new_df = spark.createDataFrame(
    [(1, "same"), (2, "edited"), (4, "brand new")], ["doc_id", "text"])
old_df = spark.createDataFrame(
    [(1, "same"), (2, "original"), (3, "gone")], ["doc_id", "text"])
cd = {r["doc_id"]: r["status"]
      for r in Pipeline(new_df).corpusDiff(old_df).collect()}
assert cd == {1: "unchanged", 2: "changed", 3: "removed", 4: "added"}, cd
print("CLASSIC OK pipe_corpus_diff")

qdf = spark.createDataFrame(
    [("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0)], ["grp", "v"])
gq = {r["q"]: r["value"] for r in Pipeline(qdf).groupQuantiles(
    groupCol="grp", valueCol="v", qs=[0.5, 1.0]).collect()}
assert gq == {0.5: 2.0, 1.0: 4.0}, gq
print("CLASSIC OK pipe_group_quantiles")

kdf = spark.createDataFrame(
    [(1, 10, 0.2), (1, 11, 0.8), (2, 20, 0.5)], ["cl", "id", "sc"])
kb = {r["cl"]: (r["id"], r["n_members"]) for r in Pipeline(kdf).keepBest(
    clusterCol="cl", idCol="id", scoreCol="sc").collect()}
assert kb == {1: (11, 2), 2: (20, 1)}, kb
print("CLASSIC OK pipe_keep_best")

qc = sorted(r["id"] for r in Pipeline(kdf).quantileCut(
    groupCol="cl", scoreCol="sc", q=1.0).collect())
assert qc == [11, 20], qc
print("CLASSIC OK pipe_quantile_cut")

ut_df = spark.createDataFrame([(1, "ab ab b")], ["doc_id", "text"])
uv = Pipeline(ut_df).unigramTrain(vocabSize=2, maxPieceLen=2, iterations=2)
vm = {r["piece"]: (r["count"], r["cost_micro_nats"]) for r in uv.collect()}
assert vm == {"ab": (2, 693147), "a": (0, 1791759), "b": (1, 1098612)}, vm
print("CLASSIC OK pipe_unigram_train")

ue = [(r["doc_id"], r["n_words"], r["n_tokens_unigram"],
       r["cost_micro_nats"], r["n_words_skipped"])
      for r in Pipeline(ut_df).unigramEncode(uv, maxPieceLen=2).collect()]
assert ue == [(1, 3, 3, 2484906, 0)], ue
print("CLASSIC OK pipe_unigram_encode")

wp_df = spark.createDataFrame([(1, "abab ab cd")], ["doc_id", "text"])
wv = Pipeline(wp_df).wordpieceVocab(vocabSize=2, maxPieceLen=2, maxWordLen=8)
wvm = {r["piece"]: r["count"] for r in wv.collect()}
assert wvm == {"ab": 2, "##ab": 1, "a": 2, "c": 1,
               "##a": 1, "##b": 3, "##d": 1}, wvm
print("CLASSIC OK pipe_wordpiece_vocab")

we = [(r["doc_id"], r["n_words"], r["n_tokens_wordpiece"], r["n_words_unk"])
      for r in Pipeline(wp_df).wordpieceEncode(
          wv, maxPieceLen=2, maxWordLen=8).collect()]
assert we == [(1, 3, 5, 0)], we
print("CLASSIC OK pipe_wordpiece_encode")

gr_df = spark.createDataFrame(
    [(1, "the cat sat with the mat here now yes we"), (2, "a b")],
    ["doc_id", "text"])
gr = {r["doc_id"]: (r["n_words"], r["keep"]) for r in Pipeline(gr_df)
      .gopherRules(minWords=5, maxWords=100, minStopwords=2).collect()}
assert gr == {1: (10, True), 2: (2, False)}, gr
print("CLASSIC OK pipe_gopher_rules")

lg_df = spark.createDataFrame(
    [(1, "http://s.com/p", '<a href="https://D.com/x">1</a><a href="/r">2</a>')],
    ["doc_id", "url", "html"])
el = sorted(r["link"] for r in Pipeline(lg_df).extractLinks().collect())
assert el == ["/r", "https://D.com/x"], el
print("CLASSIC OK pipe_extract_links")

lg = {(r["src_host"], r["dst_host"]): r["n_links"]
      for r in Pipeline(lg_df).linkGraph().collect()}
assert lg == {("s.com", "d.com"): 1, ("s.com", "s.com"): 1}, lg
print("CLASSIC OK pipe_link_graph")

# two links out to d.com vs one self-link: d.com must strictly outrank
hr_df = spark.createDataFrame(
    [(1, "http://s.com/p",
      '<a href="https://d.com/x">1</a><a href="https://d.com/y">2</a>'
      '<a href="/r">3</a>')],
    ["doc_id", "url", "html"])
hr = {r["host"]: r["pagerank"]
     for r in Pipeline(hr_df).hostRank(maxIter=5).collect()}
assert set(hr) == {"s.com", "d.com"} and hr["d.com"] > hr["s.com"], hr
print("CLASSIC OK pipe_host_rank")

spark.stop()
print("CLASSIC ALL OK")
