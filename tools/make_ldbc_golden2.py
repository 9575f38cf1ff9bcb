#!/usr/bin/env python3
"""Generate the second LDBC Graphalytics golden fixture (golden2):
~60 vertices, three components (a 24-spoke hub + 16-chain, a 12-cycle,
a bridged-triangles tail), no dangling vertices. Expected outputs are
computed HERE, independently of the engine, by directly implementing the
published LDBC Graphalytics rules:
  - BFS: undirected hop distances from the properties-file source
    (unreachable = 2^63-1)
  - CDLP: synchronous label propagation, label init = vertex id, each
    round every vertex adopts the MINIMUM among the most frequent
    neighbor labels (isolated/none keeps its own), fixed round count
  - WCC: undirected connected components labeled by component minimum
  - PR: PR_{t+1}(v) = (1-d)/n + d * sum_{u in N(v)} PR_t(u)/deg(u),
    init 1/n, no dangling by construction (undirected, all deg >= 1)
Run from repo root: python3 tools/make_ldbc_golden2.py
"""
import collections, os

OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src", "test", "resources", "ldbc", "golden2")

edges = []
# component A (1..40): hub 1 with spokes 2..25, chain 25..40, cross edges
for k in range(2, 26):
    edges.append((1, k))
for k in range(25, 40):
    edges.append((k, k + 1))
edges += [(2, 3), (4, 5), (10, 11)]
# component B (41..52): 12-cycle
for k in range(41, 52):
    edges.append((k, k + 1))
edges.append((52, 41))
# component C (53..60): two triangles bridged, with a 2-vertex tail
edges += [(53, 54), (54, 55), (55, 53),
          (56, 57), (57, 58), (58, 56),
          (55, 56), (58, 59), (59, 60)]

vertices = sorted({v for e in edges for v in e})
n = len(vertices)
adj = collections.defaultdict(list)
for u, v in edges:
    adj[u].append(v)
    adj[v].append(u)

BFS_SOURCE = 1
CDLP_ITERS = 3
PR_D = 0.85
PR_ITERS = 6

# BFS (undirected hop count)
UNREACH = 2**63 - 1
dist = {v: UNREACH for v in vertices}
dist[BFS_SOURCE] = 0
frontier = [BFS_SOURCE]
while frontier:
    nxt = []
    for u in frontier:
        for w in adj[u]:
            if dist[w] == UNREACH:
                dist[w] = dist[u] + 1
                nxt.append(w)
    frontier = nxt

# CDLP (synchronous; min of the modal neighbor labels)
label = {v: v for v in vertices}
for _ in range(CDLP_ITERS):
    new = {}
    for v in vertices:
        if not adj[v]:
            new[v] = label[v]
            continue
        freq = collections.Counter(label[w] for w in adj[v])
        top = max(freq.values())
        new[v] = min(l for l, c in freq.items() if c == top)
    label = new

# WCC (component minimum)
comp = {}
for v in vertices:
    if v in comp:
        continue
    seen = [v]
    comp[v] = v
    stack = [v]
    while stack:
        u = stack.pop()
        for w in adj[u]:
            if w not in comp:
                comp[w] = v
                seen.append(w)
                stack.append(w)
    m = min(seen)
    for w in seen:
        comp[w] = m

# PR (LDBC recurrence; no dangling: every vertex has deg >= 1)
deg = {v: len(adj[v]) for v in vertices}
assert all(d > 0 for d in deg.values())
pr = {v: 1.0 / n for v in vertices}
for _ in range(PR_ITERS):
    pr = {v: (1 - PR_D) / n + PR_D * sum(pr[u] / deg[u] for u in adj[v])
          for v in vertices}

os.makedirs(OUT, exist_ok=True)
with open(os.path.join(OUT, "golden2.v"), "w") as f:
    f.writelines(f"{v}\n" for v in vertices)
with open(os.path.join(OUT, "golden2.e"), "w") as f:
    f.writelines(f"{u} {v}\n" for u, v in edges)
with open(os.path.join(OUT, "golden2.properties"), "w") as f:
    f.write(f"graph.golden2.bfs.source-vertex = {BFS_SOURCE}\n")
    f.write(f"graph.golden2.cdlp.max-iterations = {CDLP_ITERS}\n")
    f.write(f"graph.golden2.pr.damping-factor = {PR_D}\n")
    f.write(f"graph.golden2.pr.num-iterations = {PR_ITERS}\n")
with open(os.path.join(OUT, "golden2-BFS"), "w") as f:
    f.writelines(f"{v} {dist[v]}\n" for v in vertices)
with open(os.path.join(OUT, "golden2-CDLP"), "w") as f:
    f.writelines(f"{v} {label[v]}\n" for v in vertices)
with open(os.path.join(OUT, "golden2-WCC"), "w") as f:
    f.writelines(f"{v} {comp[v]}\n" for v in vertices)
with open(os.path.join(OUT, "golden2-PR"), "w") as f:
    f.writelines(f"{v} {pr[v] / sum(pr.values())!r}\n" for v in vertices)
print(f"golden2: {n} vertices, {len(edges)} edges, "
      f"{len(set(comp.values()))} components -> {OUT}")
