"""Deterministic interleaved-document fixture generator (SURVEY.md §7 stage 0).

Produces the ``input_hint`` table — ``(doc_id, spans:list<struct<kind, text,
media_ref, offset>>)`` — plus oracle side tables ``ground_truth`` and
``labeled_pairs``, mimicking the reference's fake-identity sampler
(``am_combiner/utils/random_data.py:137-244``): several true personas may share
one pseudo-name (same blocking key), mentions-per-name follows a skewed
distribution, and an optional "hot name" concentrates mentions to exercise
skew handling.

Persona signal embedded in spans (FIXTURES.md §1):

- the first span of every doc is a ``name`` span carrying a case/accent/
  punctuation variant of the pseudo-name (all variants normalize to the same
  name-token blocking key),
- ``text`` spans are sentences embedding feature values from the persona's
  private vocabularies (associate persons / orgs / places / locations —
  analogues of the reference's PERSON/ORG/GPE/LOC NER outputs); personas that
  share a name get **disjoint** vocabularies so the oracle clustering is
  unambiguous,
- ``media`` spans carry ``media_ref`` URIs whose prefix hash-encodes the
  persona (see functions/vectorize.media_embedding),
- with probability ``dob_mention_p`` a text span mentions the persona's birth
  year (drives the negative-evidence splitter).

Everything is a pure function of ``seed`` — no wall clock, no external data.
"""

from __future__ import annotations

import hashlib
import json
import os
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from entity_resolution_ray import schema as S

# --- fixed pools (part of the generator's identity; do not reorder) --------
FIRST_NAMES = [
    "james", "mary", "john", "patricia", "robert", "jennifer", "michael",
    "linda", "william", "elizabeth", "david", "barbara", "richard", "susan",
    "joseph", "jessica", "thomas", "sarah", "charles", "karen", "daniel",
    "nancy", "matthew", "lisa", "anthony", "betty", "mark", "margaret",
    "donald", "sandra", "steven", "ashley", "paul", "kimberly", "andrew",
    "emily", "joshua", "donna", "kenneth", "michelle",
]
LAST_NAMES = [
    "smith", "johnson", "williams", "brown", "jones", "garcia", "miller",
    "davis", "rodriguez", "martinez", "hernandez", "lopez", "gonzalez",
    "wilson", "anderson", "thomas", "taylor", "moore", "jackson", "martin",
    "lee", "perez", "thompson", "white", "harris", "sanchez", "clark",
    "ramirez", "lewis", "robinson", "walker", "young", "allen", "king",
    "wright", "scott", "torres", "nguyen", "hill", "flores",
]
# synthetic surnames extend the pool so large corpora don't exhaust the name
# universe (~10k distinct names supports ~65k mentions at set-A skew)
_LAST_ROOTS = [
    "ander", "bergs", "carls", "dani", "eriks", "fergu", "gustav", "hender",
    "ivers", "jacob", "karls", "lars", "mathe", "nils", "olofs", "peders",
    "quist", "rasmus", "svens", "thors", "ulrik", "vikt", "wilhelm", "yng",
    "aalto", "bjork", "cedar", "dovre", "elvst", "fjell", "grieg", "halvor",
    "inge", "jens", "kettil", "lofot", "marst", "norda", "oster", "pilk",
]
_LAST_ROOTS += [
    "alm", "brand", "crone", "dekk", "ehren", "falk", "gran", "hjort",
    "iver", "juhl", "krog", "lind", "moen", "nyberg", "orre", "pauls",
    "ravn", "solberg", "tande", "uller", "vang", "wern", "ystad", "zetter",
    "aker", "birk", "colb", "drev", "eide", "frost", "gjerd", "hamar",
    "isdal", "jut", "kval", "lokke", "myhr", "nord", "opdahl", "prest",
]
_LAST_SUFFIXES = [
    "son", "sen", "berg", "strom", "dahl", "lund", "vik", "gaard",
    "holm", "qvist", "bakke", "haug", "stad", "feldt", "mark", "ness",
    "gren", "fors", "sjo", "tun", "land", "rud", "voll", "heim",
    "seter", "by", "nes", "as", "dal", "li",
]
LAST_NAMES = LAST_NAMES + [r + s for r in _LAST_ROOTS for s in _LAST_SUFFIXES]
FIRST_EXT = [
    "oliver", "amelia", "lucas", "sofia", "henrik", "ingrid", "viktor",
    "freya", "magnus", "astrid", "elias", "maja", "noah", "saga", "emil",
    "tuva", "axel", "signe", "felix", "runa",
    "casper", "liv", "oskar", "thea", "sander", "nora", "jonas", "ida",
    "mikkel", "selma", "tobias", "alma", "adrian", "hedda", "marius",
    "sigrid", "sverre", "oda", "trygve", "vilde",
]
FIRST_NAMES = FIRST_NAMES + FIRST_EXT

# capacity: len(FIRST_NAMES)=100 × len(LAST_NAMES)=2440 ≈ 244k distinct
# names × ~6.6 mentions/name ≈ 1.6M docs — sized for the scaling-efficiency
# demonstration corpus (BASELINE.md)
GENERATOR_VERSION = 6  # bump to invalidate cached fixture dirs on code change
ORG_ADJECTIVES = [
    "Acme", "Borealis", "Cascade", "Dynamo", "Evergreen", "Fairview",
    "Granite", "Horizon", "Ironwood", "Juniper", "Keystone", "Lakeside",
    "Meridian", "Northgate", "Obsidian", "Pinnacle", "Quarry", "Redwood",
    "Summit", "Tidewater", "Umbra", "Vanguard", "Westfield", "Yellowtail",
]
ORG_SUFFIXES = ["Corp", "Ltd", "Group", "Holdings", "Partners", "Industries"]
GPE_GAZETTEER = [
    "France", "Germany", "Brazil", "Japan", "Canada", "Kenya", "India",
    "Norway", "Chile", "Egypt", "Peru", "Spain", "Italy", "Poland", "Greece",
    "Turkey", "Vietnam", "Portugal", "Austria", "Belgium", "Denmark",
    "Finland", "Hungary", "Ireland", "Jordan", "Latvia", "Morocco", "Nepal",
    "Oman", "Panama", "Qatar", "Romania", "Senegal", "Thailand", "Uganda",
    "Uruguay", "Zambia", "Iceland", "Estonia", "Bolivia",
]
LOC_GAZETTEER = [
    "Nile River", "Amazon Basin", "Alps Range", "Sahara Desert",
    "Lake Tahoe", "Mount Fuji", "Rhine Valley", "Gobi Desert",
    "Hudson Bay", "Baltic Sea", "Andes Range", "Danube River",
    "Victoria Falls", "Coral Reef", "Black Forest", "Red Canyon",
    "Blue Lagoon", "Silver Lake", "Granite Peak", "Crystal Cave",
]
FILLER_WORDS = [
    "report", "meeting", "statement", "project", "market", "public",
    "company", "agency", "office", "plan", "deal", "review", "record",
    "media", "press", "local", "annual", "major", "recent", "early",
    "policy", "budget", "notice", "letter", "filing", "case", "court",
    "board", "panel", "audit", "survey", "study", "update", "brief",
    "memo", "draft", "note", "forum", "summit", "session",
]

TEMPLATES = [
    "{name} met with {assoc} in {gpe} to discuss the {fill0} about the {fill1}.",
    "{name} worked at {org} near {loc} according to a {fill0}.",
    "A {fill0} says {name} joined {assoc} at {org} last year.",
    "{name} traveled to {gpe} for a {fill0} with {assoc}.",
    "The {fill0} from {gpe} mentioned {name} and the {fill1} at {org}.",
    "{name} visited {loc} after the {fill0} in {gpe}.",
]
DOB_TEMPLATE = "{name} was born in {dob} according to the {fill0}."


@dataclass
class GeneratorConfig:
    n_docs: int = 1000
    seed: int = 42
    # geometric(p) mentions-per-name, capped — set-A-ish skew
    mentions_geom_p: float = 0.18
    mentions_cap: int = 50
    # P(k true personas behind one name), k = 1..4
    profiles_dist: tuple = (0.55, 0.30, 0.10, 0.05)
    # one hot name holding ~this fraction of all docs (0 disables)
    hot_name_fraction: float = 0.03
    dob_mention_p: float = 0.3
    media_span_p: float = 0.7
    # per-persona vocabulary sizes
    n_assoc: int = 6
    n_org: int = 4
    n_gpe: int = 4
    n_loc: int = 3
    # exhaustive intra-block labeled pairs explode quadratically for huge
    # blocks (a 12k-doc hot block would enumerate 72M pairs); blocks above
    # this cap are labeled over a deterministic doc subsample instead
    labeled_pairs_block_cap: int = 1500


def _name_variants(first: str, last: str) -> list[str]:
    """Surface variants that all normalize to the same name-token key."""
    f, l = first.capitalize(), last.capitalize()
    return [
        f"{f} {l}",
        f"{f.upper()} {l.upper()}",
        f"{first} {last}",
        f"{l}, {f}",
        f"{f}-{l}",
        f"{f} {l}".replace("a", "á", 1) if "a" in f"{f} {l}" else f"{f} {l}",
    ]


def generate(out_dir: str, cfg: GeneratorConfig | None = None) -> dict:
    """Write documents/ground_truth/labeled_pairs parquet + manifest.json.

    Returns the manifest dict.  Idempotent: if a manifest with the same
    config already exists, generation is skipped.
    """
    cfg = cfg or GeneratorConfig()
    os.makedirs(out_dir, exist_ok=True)
    manifest_path = os.path.join(out_dir, "manifest.json")
    cfg_key = (
        json.dumps(cfg.__dict__, sort_keys=True, default=list)
        + f"|v{GENERATOR_VERSION}"
    )
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            old = json.load(f)
        if old.get("config_key") == cfg_key:
            return old

    rng = np.random.default_rng(cfg.seed)

    # --- 1. name universe with mention counts -----------------------------
    # distinct (first, last) combos, deterministic order
    name_pool = [(f, l) for f in FIRST_NAMES for l in LAST_NAMES]
    rng.shuffle(name_pool)

    names: list[dict] = []
    docs_budget = cfg.n_docs
    hot_docs = int(cfg.n_docs * cfg.hot_name_fraction)
    if hot_docs >= 8:
        names.append({"first": "john", "last": "smith", "mentions": hot_docs})
        docs_budget -= hot_docs
    pool_i = 0
    while docs_budget > 0 and pool_i < len(name_pool):
        f, l = name_pool[pool_i]
        pool_i += 1
        if f == "john" and l == "smith" and names and names[0]["first"] == "john":
            continue
        m = int(min(rng.geometric(cfg.mentions_geom_p) + 1, cfg.mentions_cap))
        m = min(m, docs_budget)
        if m < 2 and docs_budget > 2:
            m = 2  # singleton blocks carry no pair signal; keep ≥2
        names.append({"first": f, "last": l, "mentions": m})
        docs_budget -= m

    # --- 2. personas per name, with disjoint vocabularies -----------------
    probs = np.asarray(cfg.profiles_dist) / sum(cfg.profiles_dist)
    persona_rows = []
    global_pid = 0
    orgs_pool = [f"{a} {s}" for a in ORG_ADJECTIVES for s in ORG_SUFFIXES]
    assoc_pool = [
        f"{f.capitalize()} {l.capitalize()}" for f, l in zip(
            np.repeat(FIRST_NAMES, 3), np.tile(LAST_NAMES, 3)
        )
    ]
    for name in names:
        k = int(rng.choice(len(probs), p=probs)) + 1
        if name["mentions"] >= 500:
            k = max(k, 4)  # hot name: several personas
        k = min(k, max(1, name["mentions"] // 2))
        # draw k disjoint vocab slices per feature kind
        assoc = rng.choice(len(assoc_pool), size=min(len(assoc_pool), cfg.n_assoc * k), replace=False)
        org = rng.choice(len(orgs_pool), size=min(len(orgs_pool), cfg.n_org * k), replace=False)
        gpe = rng.choice(len(GPE_GAZETTEER), size=min(len(GPE_GAZETTEER), cfg.n_gpe * k), replace=False)
        loc = rng.choice(len(LOC_GAZETTEER), size=min(len(LOC_GAZETTEER), cfg.n_loc * k), replace=False)
        dob_years = 1900 + rng.choice(24, size=k, replace=False) * 5  # ≥5y gaps
        # split mentions across personas (each ≥1)
        weights = rng.dirichlet(np.ones(k) * 2.0)
        counts = np.maximum(1, np.round(weights * name["mentions"]).astype(int))
        while counts.sum() > name["mentions"]:
            counts[np.argmax(counts)] -= 1
        while counts.sum() < name["mentions"]:
            counts[np.argmin(counts)] += 1
        for j in range(k):
            persona_rows.append(
                {
                    "pid": global_pid,
                    "first": name["first"],
                    "last": name["last"],
                    "local_code": j,
                    "n_mentions": int(counts[j]),
                    "assoc": [assoc_pool[i] for i in assoc[j * cfg.n_assoc : (j + 1) * cfg.n_assoc]],
                    "org": [orgs_pool[i] for i in org[j * cfg.n_org : (j + 1) * cfg.n_org]],
                    "gpe": [GPE_GAZETTEER[i] for i in gpe[j * cfg.n_gpe : (j + 1) * cfg.n_gpe]],
                    "loc": [LOC_GAZETTEER[i] for i in loc[j * cfg.n_loc : (j + 1) * cfg.n_loc]],
                    "dob_year": int(dob_years[j]),
                }
            )
            global_pid += 1

    # --- 3. emit docs ------------------------------------------------------
    doc_ids: list[str] = []
    spans_col: list[list[dict]] = []
    gt_rows = {"doc_id": [], "blocking_field": [], "ground_truth": [],
               "cluster_id_global": [], "dob_year": []}

    by_name: dict[str, list[tuple[str, int]]] = {}
    for p in persona_rows:
        blocking_field = f"{p['first'].capitalize()} {p['last'].capitalize()}"
        variants = _name_variants(p["first"], p["last"])
        name_slug = f"{p['first']}-{p['last']}"
        for m in range(p["n_mentions"]):
            seq = len(by_name.setdefault(blocking_field, []))
            doc_id = f"http://d/{name_slug}/{seq:05d}"
            by_name[blocking_field].append((doc_id, p["pid"]))

            spans: list[dict] = []
            offset = 0
            name_variant = variants[int(rng.integers(len(variants)))]
            spans.append({"kind": "name", "text": name_variant, "media_ref": "", "offset": offset})
            offset += len(name_variant) + 1

            n_sent = int(rng.integers(3, 8))
            a_sel = rng.choice(len(p["assoc"]), size=min(3, len(p["assoc"])), replace=False)
            o_sel = rng.choice(len(p["org"]), size=min(2, len(p["org"])), replace=False)
            g_sel = rng.choice(len(p["gpe"]), size=min(2, len(p["gpe"])), replace=False)
            l_sel = rng.choice(len(p["loc"]), size=1, replace=False)
            feat = {
                "assoc": [p["assoc"][i] for i in a_sel],
                "org": [p["org"][i] for i in o_sel],
                "gpe": [p["gpe"][i] for i in g_sel],
                "loc": [p["loc"][i] for i in l_sel],
            }
            media_count = 0
            for s_i in range(n_sent):
                tpl = TEMPLATES[int(rng.integers(len(TEMPLATES)))]
                sent = tpl.format(
                    name=name_variant,
                    assoc=feat["assoc"][int(rng.integers(len(feat["assoc"])))],
                    org=feat["org"][int(rng.integers(len(feat["org"])))],
                    gpe=feat["gpe"][int(rng.integers(len(feat["gpe"])))],
                    loc=feat["loc"][int(rng.integers(len(feat["loc"])))],
                    fill0=FILLER_WORDS[int(rng.integers(len(FILLER_WORDS)))],
                    fill1=FILLER_WORDS[int(rng.integers(len(FILLER_WORDS)))],
                )
                spans.append({"kind": "text", "text": sent, "media_ref": "", "offset": offset})
                offset += len(sent) + 1
                if rng.random() < cfg.media_span_p / n_sent * 2:
                    ref = f"media://p{p['pid']:06d}/{seq:05d}-{media_count}"
                    spans.append({"kind": "media", "text": "", "media_ref": ref, "offset": offset})
                    offset += 1
                    media_count += 1
            if rng.random() < cfg.dob_mention_p:
                sent = DOB_TEMPLATE.format(
                    name=name_variant, dob=p["dob_year"],
                    fill0=FILLER_WORDS[int(rng.integers(len(FILLER_WORDS)))],
                )
                spans.append({"kind": "text", "text": sent, "media_ref": "", "offset": offset})
                offset += len(sent) + 1

            doc_ids.append(doc_id)
            spans_col.append(spans)
            gt_rows["doc_id"].append(doc_id)
            gt_rows["blocking_field"].append(blocking_field)
            gt_rows["ground_truth"].append(p["local_code"])
            gt_rows["cluster_id_global"].append(p["pid"])
            gt_rows["dob_year"].append(p["dob_year"])

    docs_table = pa.table(
        {"doc_id": pa.array(doc_ids, pa.string()),
         "spans": pa.array(spans_col, pa.list_(S.SPAN_STRUCT))}
    )
    gt_table = pa.table(
        {k: pa.array(v) for k, v in gt_rows.items()},
        schema=S.GROUND_TRUTH_SCHEMA,
    )

    # --- 4. exhaustive intra-block labeled pairs ---------------------------
    lp = {"blocking_field": [], "doc_a": [], "doc_b": [], "is_match": []}
    for bf, members in by_name.items():
        members = sorted(members)
        if len(members) > cfg.labeled_pairs_block_cap:
            # deterministic subsample by doc-id hash order
            import hashlib as _hl

            members = sorted(
                members,
                key=lambda m: _hl.blake2b(m[0].encode(), digest_size=8).digest(),
            )[: cfg.labeled_pairs_block_cap]
            members = sorted(members)
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                lp["blocking_field"].append(bf)
                lp["doc_a"].append(members[i][0])
                lp["doc_b"].append(members[j][0])
                lp["is_match"].append(members[i][1] == members[j][1])
    lp_table = pa.table({k: pa.array(v) for k, v in lp.items()}, schema=S.LABELED_PAIRS_SCHEMA)

    # shard the documents table across files: Ray's parquet datasource
    # parallelizes reads at FILE granularity (a single file is one read
    # task no matter how many row groups), and the serial read was the
    # flagship's biggest fixed floor at 200k+ docs.  Real 100 TB inputs
    # arrive pre-sharded the same way.
    docs_path = os.path.join(out_dir, "documents.parquet")
    if os.path.isfile(docs_path):
        os.remove(docs_path)  # prior single-file layout
    os.makedirs(docs_path, exist_ok=True)
    n_rows = docs_table.num_rows
    n_shards = max(1, min(64, -(-n_rows // 16384)))
    per = -(-n_rows // n_shards)
    for i in range(n_shards):
        pq.write_table(
            docs_table.slice(i * per, per),
            os.path.join(docs_path, f"part-{i:04d}.parquet"),
            row_group_size=8192,
        )
    pq.write_table(gt_table, os.path.join(out_dir, "ground_truth.parquet"))
    pq.write_table(lp_table, os.path.join(out_dir, "labeled_pairs.parquet"))

    def _tbl_hash(t: pa.Table) -> str:
        # stream the Arrow buffers: to_pylist() on a 1.2M-doc table costs
        # minutes of serial Python; buffer bytes are deterministic for
        # tables built the same way (which is the only way these are built)
        h = hashlib.blake2b(digest_size=8)
        for col in sorted(t.column_names):
            for chunk in t.column(col).chunks:
                for buf in chunk.buffers():
                    if buf is not None:
                        h.update(buf)
        return h.hexdigest()

    manifest = {
        "config_key": cfg_key,
        "seed": cfg.seed,
        "n_docs": len(doc_ids),
        "n_names": len(by_name),
        "n_personas": global_pid,
        "n_labeled_pairs": lp_table.num_rows,
        "hashes": {
            "documents": _tbl_hash(docs_table),
            "ground_truth": _tbl_hash(gt_table),
            "labeled_pairs": _tbl_hash(lp_table),
        },
    }
    with open(manifest_path, "w") as f:
        json.dump(manifest, f, indent=2)
    return manifest


def fixture_dir_for(n_docs: int, seed: int = 42, root: str = "/tmp/er_fixtures") -> str:
    """Generate (once) and return the fixture dir for a given scale."""
    out = os.path.join(root, f"docs{n_docs}_seed{seed}")
    generate(out, GeneratorConfig(n_docs=n_docs, seed=seed))
    return out


def dedup_fixture_dir_for(n_docs: int, seed: int = 7,
                          dup_rate: float = 0.15,
                          root: str = "/tmp/dedup_fixtures") -> str:
    """Deterministic (doc_id, text) corpus for near-dedup scale benchmarks.

    ~``dup_rate`` of docs are near-copies of an earlier doc in the same
    shard with 1-3 token substitutions (word-3-gram jaccard ≥ ~0.85), the
    rest are independent 30-60-token samples from a 50k-word vocabulary.
    Generated shard-by-shard with a per-shard seeded RNG (bounded memory,
    order-independent), sharded parquet output.
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    out = os.path.join(root, f"docs{n_docs}_seed{seed}")
    docs_dir = os.path.join(out, "documents.parquet")
    done = os.path.join(out, ".done")
    if os.path.exists(done):
        return out
    os.makedirs(docs_dir, exist_ok=True)
    vocab = np.array([f"w{k:05d}" for k in range(50_000)])
    shard_rows = 100_000
    n_shards = (n_docs + shard_rows - 1) // shard_rows
    for s in range(n_shards):
        rng = np.random.default_rng((seed, s))
        n = min(shard_rows, n_docs - s * shard_rows)
        texts: list[str] = []
        for i in range(n):
            if texts and rng.random() < dup_rate:
                src = texts[int(rng.integers(0, len(texts)))].split()
                for _ in range(int(rng.integers(1, 4))):
                    src[int(rng.integers(0, len(src)))] = vocab[
                        int(rng.integers(0, len(vocab)))
                    ]
                texts.append(" ".join(src))
            else:
                ln = int(rng.integers(30, 61))
                texts.append(" ".join(vocab[rng.integers(0, len(vocab), ln)]))
        ids = [f"d{s * shard_rows + i:09d}" for i in range(n)]
        pq.write_table(
            pa.table({"doc_id": pa.array(ids, pa.string()),
                      "text": pa.array(texts, pa.string())}),
            os.path.join(docs_dir, f"part-{s:04d}.parquet"),
            row_group_size=8192,
        )
    with open(done, "w") as f:
        f.write("ok")
    return out
