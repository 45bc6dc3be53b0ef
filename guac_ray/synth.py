"""Deterministic synthetic transcript corpus + goldens (FIXTURES.md).

Pure-python generator, fixed seed, fixed base timestamp — no Ray, no
external data. Emits for each size profile:

    <dir>/transcripts/part-NNNN.parquet   shuffled-within-shard rows
    <dir>/entity_catalog.parquet          surface → canonical key (F3)
    <dir>/vulndb.parquet                  local OSV analog (F4)
    <dir>/golden/edges.parquet            deduped identity edge set (F5)
    <dir>/golden/nodes.parquet            deduped node set
    <dir>/golden/enrich_edges.parquet     certify_vuln incl. noVuln negatives
    <dir>/golden/turn_text.parquet        per-turn text-equality oracle
    <dir>/stats.json                      counts + skew profile

Ground truth is recorded AT GENERATION from the template parameters (the
canonical entity pools), not by re-parsing text — the extractor must
recover it from raw text to score P/R (reference test model:
internal/testing/testdata/testdata.go embeds fixtures + expected
predicate structs).
"""

from __future__ import annotations

import json
import os
from datetime import datetime, timedelta

import numpy as np
import pandas as pd
import pyarrow as pa

from guac_ray.arrowutil import table_from_pandas
import pyarrow.parquet as pq

from guac_ray.canonical import (
    artifact_key,
    entity_key,
    hash_license,
    license_key,
    package_key,
    parse_license_expression,
    parse_vcs,
    source_key,
    vuln_key,
    NO_VULN_KEY,
)
from guac_ray.stages import rules
from guac_ray.stages.rules import TurnFacts, derive, make_edge

BASE_TS = datetime(2026, 1, 1, 0, 0, 0)
SEED = 42
# bump when templates/pools/rules change: stale /tmp fixtures from an
# older generator regenerate instead of silently mismatching the code
CORPUS_VERSION = 5  # v5: transcript shards carry no pandas schema metadata

EDGE_ID_COLS = [
    "subj_type", "subj_key", "pred", "obj_type", "obj_key",
    "props", "justification", "origin", "collector",
]

# ---------------------------------------------------------------------------
# entity catalog (F3): alias groups + near-misses
# ---------------------------------------------------------------------------

TOOL_ALIASES = {
    "search": ["search", "google search", "websearch", "web_search"],
    "web-browser": ["browser", "web browser", "chrome", "firefox"],
    "editor": ["editor", "vim", "emacs", "code editor"],
    "bash": ["bash", "shell", "terminal"],
    "python": ["python", "python3"],
}
NEAR_MISS_TOOLS = ["searcher", "brows", "editr"]  # must NOT link (F3)
HOT_TOOL = "search"

LICENSES = ["MIT", "Apache-2.0", "GPL-3.0-only", "BSD-3-Clause", "MPL-2.0"]
LICENSE_EXCEPTION = "Classpath-exception-2.0"
INLINE_LICENSES = [f"Custom license text {i} for internal use." for i in range(6)]
BUILDERS = [f"https://builder{i}.example.com/v1" for i in range(6)]
CONTACTS = [f"dev{i}@example.org" for i in range(10)]


def tool_link_map() -> dict[str, str]:
    out = {}
    for canon, surfaces in TOOL_ALIASES.items():
        for s in surfaces:
            out[s] = f"ent:tool/{canon}"
    return out


def _mk_pools(rng: np.random.Generator):
    """Entity pools with raw (messy) surface forms + canonical keys."""
    pkgs = []
    types = ["npm", "pypi", "golang", "maven", "oci"]
    for i in range(60):
        t = types[i % len(types)]
        ns = {"npm": "@scope", "golang": "github.com/org", "maven": "org.example",
              "oci": "", "pypi": ""}[t]
        name = f"lib{i}" if i % 11 else f"we%20ird{i}"  # escaped-space name
        ver = f"{rng.integers(0, 4)}.{rng.integers(0, 10)}.{rng.integers(0, 20)}"
        if i % 7 == 3:
            ver = ""  # versionless purl: AllVersions-level (MatchFlags) attach
        raw = f"pkg:{t}/" + (f"{ns}/" if ns else "") + name + (f"@{ver}" if ver else "")
        if i % 3 == 0 and ver:  # unsorted qualifiers test canonical sorting
            raw += "?os=linux&arch=amd64" if i % 2 else "?arch=amd64&os=linux"
        pkgs.append({"raw": raw, "key": package_key(raw)})
    arts = []
    for i in range(40):
        hexd = "".join(rng.choice(list("0123456789abcdef"), 64))
        raw_hex = hexd.upper() if i % 4 == 0 else hexd  # case-folding test
        arts.append({"raw": f"sha256:{raw_hex}", "key": artifact_key("sha256", hexd)})
    repos = []
    for i in range(30):
        base = f"git+https://github.com/org{i % 7}/repo{i}"
        if i % 2:
            rev = f"v{rng.integers(0, 5)}.{rng.integers(0, 10)}.{rng.integers(0, 10)}"
        else:
            rev = "".join(rng.choice(list("0123456789abcdef"), 40))
        raw = base + (".git" if i % 5 == 0 else "") + f"@{rev}"
        repos.append({"raw": raw, "key": source_key(parse_vcs(raw))})
    vulns = []
    for i in range(24):
        vid = f"CVE-20{20 + i % 6}-{1000 + i}"
        raw = vid.lower() if i % 3 == 0 else vid  # mixed-case test
        vulns.append({"raw": raw, "key": vuln_key(vid)})
    for i in range(8):
        vid = f"GHSA-{''.join(rng.choice(list('abcdefghjkmnpqrstuvwxyz23456789'), 4))}-aaaa-bbb{i}"
        vulns.append({"raw": vid, "key": vuln_key(vid)})
    return {"pkgs": pkgs, "arts": arts, "repos": repos, "vulns": vulns}


# ---------------------------------------------------------------------------
# turn text templates — each appends a fragment and updates TurnFacts
# ---------------------------------------------------------------------------

def _apply_template(kind: str, rng: np.random.Generator, pools, facts: TurnFacts) -> str:
    def pick(k):
        return pools[k][int(rng.integers(0, len(pools[k])))]

    if kind == "pkg":
        p = pick("pkgs")
        facts.packages.append(p["key"])
        return f"we installed {p['raw']} today"
    if kind == "artifact":
        a = pick("arts")
        facts.artifacts.append(a["key"])
        return f"produced artifact {a['raw']}"
    if kind == "occurrence":
        p, a = pick("pkgs"), pick("arts")
        facts.packages.append(p["key"])
        facts.artifacts.append(a["key"])
        return f"package {p['raw']} has digest {a['raw']}"
    if kind == "repo":
        r = pick("repos")
        facts.repos.append(r["key"])
        return f"see {r['raw']} for details"
    if kind == "vuln":
        v = pick("vulns")
        facts.vulns.append(v["key"])
        return f"this relates to {v['raw']}"
    if kind == "vuln_pair":
        v1, v2 = pick("vulns"), pick("vulns")
        facts.vulns.append(v1["key"])
        facts.vulns.append(v2["key"])
        return f"{v1['raw']} is also tracked as {v2['raw']}"
    if kind == "hash_pair":
        a1, a2 = pick("arts"), pick("arts")
        facts.artifacts.append(a1["key"])
        facts.artifacts.append(a2["key"])
        return f"mirrors carry {a1['raw']} and {a2['raw']}"
    if kind == "scorecard":
        r = pick("repos")
        score = round(float(rng.integers(0, 101)) / 10.0, 1)
        facts.repos.append(r["key"])
        facts.scorecards.append((r["key"], score))
        return f"scorecard score {score}/10 for {r['raw']}"
    if kind == "legal":
        # SPDX-style compound expression; ';' terminates it (license
        # names contain '.', so '.' cannot delimit)
        p = pick("pkgs")
        n = 1 + int(rng.integers(0, 3))
        idxs = rng.choice(len(LICENSES), size=n, replace=False)
        lics = [LICENSES[int(i)] for i in idxs]
        exp = lics[0]
        for lc in lics[1:]:
            exp += (" AND " if rng.random() < 0.5 else " OR ") + lc
        if n > 1 and rng.random() < 0.3:
            exp = f"({exp})"
        if rng.random() < 0.25:
            exp += f" WITH {LICENSE_EXCEPTION}"
        facts.packages.append(p["key"])
        for name in parse_license_expression(exp):
            facts.legals.append((p["key"], license_key(name)))
        return f"{p['raw']} is licensed under {exp};"
    if kind == "legal_ref":
        # document-local LicenseRef + inline text → FNV-hashed name
        p = pick("pkgs")
        idx = int(rng.integers(0, len(INLINE_LICENSES)))
        inline = INLINE_LICENSES[idx]
        ref = f"LicenseRef-custom{idx}"
        facts.packages.append(p["key"])
        facts.legals.append((p["key"], license_key(hash_license(inline))))
        return f'{p["raw"]} is licensed under {ref} where {ref} reads "{inline}";'
    if kind == "slsa":
        a = pick("arts")
        b = BUILDERS[int(rng.integers(0, len(BUILDERS)))]
        facts.artifacts.append(a["key"])
        facts.builders.append(b)
        return f"artifact {a['raw']} was built by {b}"
    if kind == "good":
        p = pick("pkgs")
        facts.packages.append(p["key"])
        facts.endorsements.append(("package", p["key"]))
        return f"endorsed: {p['raw']}"
    if kind == "bad":
        p = pick("pkgs")
        facts.packages.append(p["key"])
        facts.flags.append(("package", p["key"]))
        return f"flagged: {p['raw']}"
    if kind == "contact":
        p = pick("pkgs")
        c = CONTACTS[int(rng.integers(0, len(CONTACTS)))]
        facts.packages.append(p["key"])
        facts.contacts.append(c)
        return f"contact {c} for {p['raw']}"
    if kind == "severity":
        v = pick("vulns")
        score = round(float(rng.integers(1, 101)) / 10.0, 1)
        facts.vulns.append(v["key"])
        facts.severities.append((v["key"], score))
        return f"severity {score} for {v['raw']}"
    if kind in ("dep", "pkg_eq"):
        # two DISTINCT pool entries (distinct canonical keys by pool
        # construction) — the grammars skip self-pairs
        n = len(pools["pkgs"])
        i = int(rng.integers(0, n))
        j = int(rng.integers(0, n - 1))
        j += int(j >= i)
        p, q = pools["pkgs"][i], pools["pkgs"][j]
        facts.packages.append(p["key"])
        facts.packages.append(q["key"])
        if kind == "dep":
            facts.dependencies.append((p["key"], q["key"]))
            return f"{p['raw']} depends on {q['raw']}"
        facts.equal_pkgs.append((p["key"], q["key"]))
        return f"{p['raw']} is the same as {q['raw']}"
    raise ValueError(kind)


TEMPLATES = [
    ("pkg", 0.22), ("artifact", 0.12), ("occurrence", 0.10), ("repo", 0.10),
    ("vuln", 0.10), ("vuln_pair", 0.04), ("hash_pair", 0.04),
    ("scorecard", 0.05), ("legal", 0.04), ("legal_ref", 0.01), ("slsa", 0.04),
    ("good", 0.035), ("bad", 0.035), ("contact", 0.035), ("severity", 0.035),
    ("dep", 0.05), ("pkg_eq", 0.02),
]
T_KINDS = [t for t, _ in TEMPLATES]
T_PROBS = np.array([p for _, p in TEMPLATES])
T_PROBS = T_PROBS / T_PROBS.sum()

FILLERS = [
    "Let me check that.", "Here is what I found.", "Working on it now.",
    "That looks correct.", "Running the next step.", "Results are in.",
]
ROLES = ["user", "assistant", "system", "tool"]


def _gen_conversation(ci: int, n_turns: int, rng, pools, link, hot_frac: float, prefix: str = "c"):
    """→ (rows, per-turn TurnFacts list). Turn 0 is never invalid."""
    conv_id = f"{prefix}{ci:06d}"
    rows, facts_list = [], []
    for ti in range(n_turns):
        role = ROLES[int(rng.integers(0, 2))] if ti % 2 == 0 else ROLES[1]
        if rng.random() < 0.08:
            role = ROLES[int(rng.integers(2, 4))]
        invalid = ti > 0 and rng.random() < 0.01
        # tool column: hot key ~40%, other surfaces ~15%, empty otherwise (F2)
        u = rng.random()
        if u < hot_frac:
            tool = HOT_TOOL
        elif u < hot_frac + 0.15:
            all_surfaces = [s for ss in TOOL_ALIASES.values() for s in ss] + NEAR_MISS_TOOLS
            tool = all_surfaces[int(rng.integers(0, len(all_surfaces)))]
        else:
            tool = ""
        ts = BASE_TS + timedelta(seconds=ci * 3600 + ti * 7)
        if invalid:
            bad_kind = rng.random()
            text = "" if bad_kind < 0.5 else FILLERS[int(rng.integers(0, len(FILLERS)))]
            row_role = role if bad_kind < 0.5 else "robot"
            rows.append((conv_id, ti, row_role, text, tool, ts))
            facts_list.append(None)
            continue
        facts = TurnFacts(conv_id=conv_id, turn_idx=ti, role=role, tool_surface=tool)
        parts = [FILLERS[int(rng.integers(0, len(FILLERS)))]]
        if rng.random() >= 0.45:  # 45% of turns have no mentions (negatives)
            for _ in range(int(rng.integers(1, 4))):
                kind = T_KINDS[int(rng.choice(len(T_KINDS), p=T_PROBS))]
                parts.append(_apply_template(kind, rng, pools, facts))
        text = " ".join(parts)
        rows.append((conv_id, ti, role, text, tool, ts))
        facts_list.append(facts)
    return rows, facts_list


def _facts_to_golden(facts: TurnFacts, link: dict[str, str]) -> list[tuple]:
    """derive() + tool-alias linking → edges with linked keys."""
    edges = derive(facts)

    def link_key(k: str) -> str:
        if k.startswith("ent:tool/"):
            surface = k[len("ent:tool/"):]
            from urllib.parse import unquote
            return link.get(unquote(surface), k)
        return k

    return [(e[0], link_key(e[1]), e[2], e[3], link_key(e[4])) + e[5:] for e in edges]


def generate_corpus(
    out_dir: str,
    n_convs: int,
    n_shards: int,
    seed: int = SEED,
    hot_frac: float = 0.40,
    force: bool = False,
    conv_prefix: str = "c",
) -> dict:
    """Write the full corpus; idempotent via a done-marker. Returns paths."""
    marker = os.path.join(out_dir, "_done.json")
    paths = {
        "dir": out_dir,
        "transcripts": os.path.join(out_dir, "transcripts"),
        "catalog": os.path.join(out_dir, "entity_catalog.parquet"),
        "vulndb": os.path.join(out_dir, "vulndb.parquet"),
        "depdb": os.path.join(out_dir, "depdb.parquet"),
        "golden_edges": os.path.join(out_dir, "golden", "edges.parquet"),
        "golden_nodes": os.path.join(out_dir, "golden", "nodes.parquet"),
        "golden_enrich": os.path.join(out_dir, "golden", "enrich_edges.parquet"),
        "golden_turn_text": os.path.join(out_dir, "golden", "turn_text.parquet"),
    }
    # the marker pins generator version AND parameters: a dir built for
    # a different (n_convs, n_shards, seed) must rebuild, not be reused
    want_params = {"n_convs": n_convs, "n_shards": n_shards, "seed": seed,
                   "hot_frac": hot_frac, "conv_prefix": conv_prefix}
    if os.path.exists(marker) and not force:
        try:
            with open(marker) as fh:
                done = json.load(fh)
        except (OSError, json.JSONDecodeError):
            done = {}
        if (done.get("corpus_version") == CORPUS_VERSION
                and done.get("params") == want_params):
            return paths
        # stale generator output — rebuild from scratch
        import shutil as _sh

        _sh.rmtree(out_dir, ignore_errors=True)
    os.makedirs(paths["transcripts"], exist_ok=True)
    os.makedirs(os.path.join(out_dir, "golden"), exist_ok=True)

    rng = np.random.default_rng(seed)
    pools = _mk_pools(rng)
    link = tool_link_map()

    all_rows: list[tuple] = []
    all_edges: list[tuple] = []
    saved_for_dup = None
    for ci in range(n_convs):
        if ci == 0:
            n_turns = 1                      # single-turn edge case
        elif ci == 1:
            n_turns = 16                     # max-length edge case
        else:
            n_turns = int(rng.integers(3, 13))
        rows, facts_list = _gen_conversation(ci, n_turns, rng, pools, link, hot_frac, conv_prefix)
        if ci == 2:
            saved_for_dup = (rows, facts_list)
        for row, facts in zip(rows, facts_list):
            all_rows.append(row)
            if facts is not None:
                e = _facts_to_golden(facts, link)
                all_edges.extend(rules.edge_cols(e, facts.conv_id, facts.turn_idx))

    # byte-identical duplicate conversation under a fresh conv_id — dedup
    # must keep both (identity includes the conversation key)
    dup_ci = n_convs
    dup_id = f"{conv_prefix}{dup_ci:06d}"
    if saved_for_dup is None:
        # n_convs < 3 never reaches the ci == 2 conversation that seeds
        # the duplicate block — fall back to the last conversation so a
        # minimal smoke corpus still carries its planted exact-dup
        saved_for_dup = (rows, facts_list)
    rows, facts_list = saved_for_dup
    for row, facts in zip(rows, facts_list):
        ts = BASE_TS + timedelta(seconds=dup_ci * 3600 + row[1] * 7)
        all_rows.append((dup_id, row[1], row[2], row[3], row[4], ts))
        if facts is not None:
            import copy
            f2 = copy.copy(facts)
            f2.conv_id = dup_id
            e = _facts_to_golden(f2, link)
            all_edges.extend(rules.edge_cols(e, dup_id, f2.turn_idx))

    # ---- write transcripts: shuffle, shard ----
    df = pd.DataFrame(
        all_rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )
    df["turn_idx"] = df["turn_idx"].astype("int32")
    df["ts"] = pd.to_datetime(df["ts"]).astype("datetime64[us]")
    perm = rng.permutation(len(df))
    df = df.iloc[perm].reset_index(drop=True)
    for i, shard in enumerate(np.array_split(np.arange(len(df)), n_shards)):
        # strip the pandas schema metadata: pa.Schema with it is
        # unhashable, and Ray Data's block-concat schema dedup logs a
        # "Failed to hash the schemas" warning per worker otherwise
        t = table_from_pandas(df.iloc[shard], preserve_index=False)
        pq.write_table(t.replace_schema_metadata(None),
                       os.path.join(paths["transcripts"], f"part-{i:04d}.parquet"))

    # ---- catalog ----
    cat_rows = []
    for canon, surfaces in TOOL_ALIASES.items():
        for s in surfaces:
            cat_rows.append((s, "tool", f"ent:tool/{canon}", "{}"))
    for r in ROLES:
        cat_rows.append((r, "speaker", entity_key("speaker", r), "{}"))
    pd.DataFrame(cat_rows, columns=["surface", "ent_type", "ent_key", "attrs"]).to_parquet(
        paths["catalog"], index=False
    )

    # ---- vulndb (~20% of package pool has vulns; rest ⇒ noVuln) ----
    vdb_rows = []
    pkg_keys = sorted({p["key"] for p in pools["pkgs"]})
    vuln_ids = sorted({v["key"].rsplit("/", 1)[1] for v in pools["vulns"]})
    for i, pk in enumerate(pkg_keys):
        if i % 5 == 0:
            for j in range(1 + i % 2):
                vdb_rows.append(
                    (pk, vuln_ids[(i + j) % len(vuln_ids)], round(1.0 + (i % 90) / 10, 1), BASE_TS)
                )
    vdb = pd.DataFrame(vdb_rows, columns=["ent_key", "vuln_id", "score", "ts"])
    vdb["ts"] = pd.to_datetime(vdb["ts"]).astype("datetime64[us]")
    vdb.to_parquet(paths["vulndb"], index=False)

    # ---- depdb (deps.dev analog — deps_dev.go:44-132): NAME-level
    # dependency adjacency; dep objects are AllVersions keys ----
    from guac_ray.canonical import package_name_key
    name_keys = sorted({package_name_key(pk) or pk.split("@", 1)[0]
                        for pk in pkg_keys})
    dep_rows = []
    for i, nk in enumerate(name_keys):
        for j in range(i % 3):  # 0–2 deps per name, deterministic
            dk = name_keys[(i * 7 + j * 11 + 1) % len(name_keys)]
            if dk != nk:
                dep_rows.append((nk, dk, f"^{j}.{i % 10}"))
    pd.DataFrame(dep_rows, columns=["pkg_name", "dep_name", "requirement"]) \
        .drop_duplicates(["pkg_name", "dep_name"]) \
        .to_parquet(paths["depdb"], index=False)

    # ---- goldens ----
    edf = pd.DataFrame(all_edges, columns=EDGE_ID_COLS + ["conv_id", "turn_idx"])
    golden_edges = (
        edf[EDGE_ID_COLS].drop_duplicates().sort_values(EDGE_ID_COLS).reset_index(drop=True)
    )
    golden_edges.to_parquet(paths["golden_edges"], index=False)
    node_set = rules.nodes_from_edges(golden_edges.itertuples(index=False))
    ndf = pd.DataFrame(sorted(node_set), columns=["node_type", "node_key", "attrs"])
    golden_nodes = ndf.reset_index(drop=True)
    golden_nodes.to_parquet(paths["golden_nodes"], index=False)

    # enrichment golden: every distinct package node → certify_vuln edges
    vmap: dict[str, list[str]] = {}
    for _, r in vdb.iterrows():
        vmap.setdefault(r["ent_key"], []).append(r["vuln_id"])
    enrich = []
    for pk in sorted(golden_nodes[golden_nodes.node_type == "package"].node_key):
        hits = vmap.get(pk)
        if hits:
            for vid in sorted(set(hits)):
                enrich.append(
                    make_edge("package", pk, "certify_vuln", "vulnerability",
                              vuln_key(vid), {"scanner": "local-vulndb"},
                              origin=rules.ENRICH_ORIGIN, collector=rules.ENRICH_COLLECTOR)
                )
        else:
            enrich.append(
                make_edge("package", pk, "certify_vuln", "vulnerability",
                          NO_VULN_KEY, {"scanner": "local-vulndb"},
                          origin=rules.ENRICH_ORIGIN, collector=rules.ENRICH_COLLECTOR)
            )
    pd.DataFrame(enrich, columns=EDGE_ID_COLS).drop_duplicates().sort_values(
        EDGE_ID_COLS
    ).reset_index(drop=True).to_parquet(paths["golden_enrich"], index=False)

    # per-turn text-equality oracle: valid rows only, stable order
    valid = df[(df.text != "") & (df.role.isin(ROLES))]
    valid[["conv_id", "turn_idx", "text"]].sort_values(
        ["conv_id", "turn_idx"]
    ).reset_index(drop=True).to_parquet(paths["golden_turn_text"], index=False)

    stats = {
        "n_convs": n_convs + 1,
        "n_turns": len(df),
        "n_valid_turns": int(len(valid)),
        "n_golden_edges": int(len(golden_edges)),
        "n_golden_nodes": int(len(golden_nodes)),
        "hot_tool_share": float((df.tool == HOT_TOOL).mean()),
        "seed": seed,
        "corpus_version": CORPUS_VERSION,
    }
    with open(os.path.join(out_dir, "stats.json"), "w") as f:
        json.dump(stats, f, indent=1)
    with open(marker, "w") as f:
        json.dump({"ok": True, "params": want_params, **stats}, f)
    return paths


# size profiles keyed by the testdata sf dir name (FIXTURES.md sizes)
PROFILES = {
    "sf0.001": dict(n_convs=200, n_shards=2),    # ~1.5k turns (smoke)
    "sf0.01": dict(n_convs=2000, n_shards=4),    # ~15k turns (test)
    "sf0.1": dict(n_convs=20000, n_shards=8),    # ~150k turns (bench)
    # scaling-efficiency runs need a compute-bound job: ~750k turns so the
    # fixed per-job overhead (actor spin-up, shuffle setup) is amortized
    "scaling": dict(n_convs=100000, n_shards=16),
}

FIXTURE_ROOT = "/tmp/guac_ray_fixtures"


def corpus_for_sf(sf_dir: str) -> dict:
    """Deterministic corpus matched to a testdata sf dir; cached in /tmp."""
    name = os.path.basename(os.path.normpath(sf_dir))
    prof = PROFILES.get(name, PROFILES["sf0.01"])
    return generate_corpus(os.path.join(FIXTURE_ROOT, name), **prof)


def ensure_scaling_corpus(
    n_chunks: int = 10, convs_per_chunk: int = 100000, procs: int = 10
) -> dict:
    """~7.5M-turn corpus for the scaling-efficiency measurement, built as
    seed-distinct chunks IN PARALLEL (conv-id prefixes keep conversations
    globally unique) and exposed as one flat transcripts dir of links.
    Cached; first build ≈ a few minutes of CPU."""
    import multiprocessing as mp

    root = os.path.join(FIXTURE_ROOT, "scaling-xl")
    flat = os.path.join(root, "transcripts")
    catalog = os.path.join(root, "entity_catalog.parquet")
    marker = os.path.join(root, "_flat_done.json")
    if os.path.exists(marker):
        try:
            with open(marker) as fh:
                mk = json.load(fh)
                # sizing params are part of the identity: a marker hit
                # on version alone would silently return a corpus of a
                # DIFFERENT size to a scaling measurement
                ok = (mk.get("corpus_version") == CORPUS_VERSION
                      and mk.get("n_chunks") == n_chunks
                      and mk.get("convs_per_chunk") == convs_per_chunk)
        except (OSError, json.JSONDecodeError):
            ok = False
        if ok:
            return {"dir": root, "transcripts": flat, "catalog": catalog}
        import shutil as _sh

        _sh.rmtree(root, ignore_errors=True)  # chunks + stale hard links

    with mp.Pool(min(procs, n_chunks)) as pool:
        pool.starmap(
            _gen_chunk,
            [(os.path.join(root, f"chunk{i}"), convs_per_chunk, 42 + i, f"x{i}c")
             for i in range(n_chunks)],
        )
    os.makedirs(flat, exist_ok=True)
    for i in range(n_chunks):
        src_dir = os.path.join(root, f"chunk{i}", "transcripts")
        for f in sorted(os.listdir(src_dir)):
            dst = os.path.join(flat, f"c{i:02d}-{f}")
            if not os.path.exists(dst):
                os.link(os.path.join(src_dir, f), dst)
    import shutil as _sh

    _sh.copyfile(os.path.join(root, "chunk0", "entity_catalog.parquet"), catalog)
    with open(marker, "w") as f:
        json.dump({"n_chunks": n_chunks, "convs_per_chunk": convs_per_chunk,
                   "corpus_version": CORPUS_VERSION}, f)
    return {"dir": root, "transcripts": flat, "catalog": catalog}


def _gen_chunk(out_dir: str, n_convs: int, seed: int, prefix: str) -> None:
    generate_corpus(out_dir, n_convs=n_convs, n_shards=4, seed=seed,
                    conv_prefix=prefix)
