"""Deterministic synthetic Common-Crawl-style pages with embedded GPML
islands (FIXTURES.md §1-2). No external data; fixed seed ⇒ byte-identical
corpus on every run (required for resume/idempotence tests).

Schema (BASELINE.json input_hint):
  url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string

Island families mirror the reference test fixtures
(/root/reference/test/expected): data-nodes, interactions (markers+anchors),
graphical-lines, elbow/curved edges, groups, states, labels/shapes,
publication-xrefs (incl. the rdf:id bug), hyperedges, plus malformed islands
exercising the quarantine path. Header variants cover the lowercase-utf-8 /
single-quotes fixtures.
"""

from __future__ import annotations

import datetime
import os
import random

import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42

_WORDS_EN = (
    "the of protein pathway cell signal receptor kinase expression gene "
    "binding membrane activity regulation metabolic transport response "
    "complex during analysis between human mouse model data results level "
    "and with that from this have been were are was for not can which "
    "process function interaction network biology molecular"
).split()

_WORDS_DE = (
    "der die das und ist ein eine von mit nicht auf auch zelle protein "
    "signalweg bindung membran regulation ausdruck zwischen ergebnisse "
    "wurden sind werden für prozess funktion netzwerk"
).split()

_WORDS_FR = (
    "le la les et est une des dans pour avec pas sur cellule protéine "
    "voie liaison membrane régulation expression entre résultats sont "
    "été processus fonction réseau"
).split()

_LANG_WORDS = {"en": _WORDS_EN, "de": _WORDS_DE, "fr": _WORDS_FR}

XREF_DATASOURCES = [
    ("Entrez Gene", lambda rng: str(rng.randrange(1000, 99999))),
    ("Ensembl", lambda rng: "ENSG%011d" % rng.randrange(1, 100000)),
    ("HMDB", lambda rng: "HMDB%07d" % rng.randrange(1, 70000)),
    ("Uniprot-TrEMBL", lambda rng: "P%05d" % rng.randrange(10000, 99999)),
    ("ChEBI", lambda rng: str(rng.randrange(100, 99999))),
    ("Wikidata", lambda rng: "Q%d" % rng.randrange(1000, 10000000)),
    # deliberately unknown to the linker dictionary:
    ("LegacyDB", lambda rng: "L%04d" % rng.randrange(1, 9999)),
]

WP_TYPES = ["GeneProduct", "Metabolite", "Protein", "Rna", "Pathway",
            "Complex", "Unknown"]

ARROWHEADS = ["Arrow", "TBar", "mim-inhibition", "mim-conversion",
              "mim-catalysis", "mim-stimulation", "mim-binding",
              "mim-modification", "mim-necessary-stimulation",
              "mim-transcription-translation", "mim-cleavage"]

HEADERS = [
    '<?xml version="1.0" encoding="UTF-8"?>\n',
    '<?xml version="1.0" encoding="utf-8"?>\n',      # lowercase-utf-8 fixture
    "<?xml version='1.0' encoding='UTF-8'?>\n",      # single-quotes fixture
    "",                                              # headerless
]

NS = "http://pathvisio.org/GPML/2013a"


def _rng_for(i: int, seed: int = SEED) -> random.Random:
    return random.Random((seed << 32) ^ (i * 2654435761 % 2**32))


def _prose(rng: random.Random, lang: str, n_sentences: int) -> str:
    words = _LANG_WORDS[lang]
    sentences = []
    for _ in range(n_sentences):
        k = rng.randrange(6, 16)
        ws = [rng.choice(words) for _ in range(k)]
        sentences.append(" ".join(ws).capitalize() + ".")
    return " ".join(sentences)


# Popular entities: a small pool drawn with ~12% probability, creating (a)
# heavy-hitter subjects for the salting path and (b) Entrez/Ensembl alias
# pairs that canonicalize to the SAME ncbigene IRI (Ensembl even ids map to
# ncbigene n % 98999 + 1000 in sources/xrefs.py) so the unification groupby
# has real alias merges.
_POPULAR: list[tuple[str, str]] = []
for _n in range(2000, 2050, 2):  # even → aliases to ncbigene _n%98999+1000
    _POPULAR.append(("Ensembl", "ENSG%011d" % _n))
    _POPULAR.append(("Entrez Gene", str(_n % 98999 + 1000)))


# Outlink universe for the host link-graph ops: 20 external hosts with
# Zipf-ish popularity so the host graph has genuine hubs (site00 ≫ site19)
# — the skew the link-graph aggregation and host-PageRank ops must handle.
_LINK_HOSTS = [f"https://site{k:02d}.synthetic.test" for k in range(20)]
_LINK_WEIGHTS = [1.0 / (k + 1) for k in range(20)]


def _linkify(rng: random.Random, paragraph: str) -> str:
    """Wrap 0-2 words of the paragraph in <a href> anchors. Tag-strip
    leaves the word in place, so extracted text stays byte-identical to
    the raw paragraph (the per-url text invariant)."""
    words = paragraph.split(" ")
    n_links = rng.choices([0, 1, 2], weights=[35, 45, 20])[0]
    n_links = min(n_links, len(words))
    if not n_links:
        return paragraph
    for w in sorted(rng.sample(range(len(words)), n_links)):
        host = rng.choices(_LINK_HOSTS, weights=_LINK_WEIGHTS)[0]
        href = f"{host}/page/{rng.randrange(1000)}"
        words[w] = f'<a href="{href}">{words[w]}</a>'
    return " ".join(words)


def _xref(rng: random.Random) -> tuple[str, str]:
    if rng.random() < 0.12:
        return _POPULAR[rng.randrange(len(_POPULAR))]
    ds, gen = XREF_DATASOURCES[rng.randrange(len(XREF_DATASOURCES))]
    return ds, gen(rng)


def _data_node(rng, graph_id, x=None, y=None, group_ref=None,
               wp_type=None) -> str:
    wp_type = wp_type or rng.choice(WP_TYPES)
    ds, xid = _xref(rng)
    cx = x if x is not None else round(rng.uniform(60, 900), 6)
    cy = y if y is not None else round(rng.uniform(60, 700), 6)
    gref = f' GroupRef="{group_ref}"' if group_ref else ""
    return (
        f'  <DataNode TextLabel="{wp_type}_{graph_id}" GraphId="{graph_id}"'
        f'{gref} Type="{wp_type}">\n'
        f'    <Graphics CenterX="{cx}" CenterY="{cy}" Width="80.0" '
        f'Height="20.0" ZOrder="32768" FontSize="10" Valign="Middle" />\n'
        f'    <Xref Database="{ds}" ID="{xid}" />\n'
        f"  </DataNode>\n")


def _interaction(rng, graph_id, p0, p1, ref0=None, ref1=None,
                 arrow=None, connector=None, anchors=()) -> str:
    conn = f' ConnectorType="{connector}"' if connector else ""
    pts = []
    for (x, y), ref, rel, ah in (
            (p0, ref0, ("0.0", "1.0"), None),
            (p1, ref1, ("0.0", "-1.0"), arrow)):
        attrs = f'X="{x}" Y="{y}"'
        if ref:
            attrs += f' GraphRef="{ref}" RelX="{rel[0]}" RelY="{rel[1]}"'
        if ah:
            attrs += f' ArrowHead="{ah}"'
        pts.append(f"      <Point {attrs} />")
    anchor_lines = [
        f'      <Anchor Position="{pos}" GraphId="{aid}"{shape} />'
        for (pos, aid, shape) in anchors]
    body = "\n".join(pts + anchor_lines)
    return (
        f'  <Interaction GraphId="{graph_id}">\n'
        f'    <Graphics ZOrder="12288" LineThickness="1.0"{conn}>\n'
        f"{body}\n"
        f"    </Graphics>\n"
        f'    <Xref Database="" ID="" />\n'
        f"  </Interaction>\n")


def _pathway(rng, body: str, name=None, header=0, organism="Homo sapiens",
             extra_attrs="") -> str:
    name = name or f"Synthetic pathway {rng.randrange(1, 10**6)}"
    w = round(rng.uniform(400, 1200), 4)
    h = round(rng.uniform(300, 900), 4)
    return (
        HEADERS[header]
        + f'<Pathway xmlns="{NS}" Name="{name}" Organism="{organism}" '
        + f'Version="{rng.randrange(2010, 2026)}0101"{extra_attrs}>\n'
        + f'  <Graphics BoardWidth="{w}" BoardHeight="{h}" />\n'
        + body
        + '  <InfoBox CenterX="0.0" CenterY="0.0" />\n'
        + "</Pathway>")


# ---- island families ------------------------------------------------------

def island_data_nodes(rng) -> str:
    n = rng.randrange(2, 8)
    body = "".join(_data_node(rng, f"dn{i:03d}{rng.randrange(16):x}")
                   for i in range(n))
    return _pathway(rng, body)


def island_interactions(rng) -> str:
    parts = []
    ids = []
    for i in range(rng.randrange(2, 5)):
        gid = f"n{i}a{rng.randrange(4096):03x}"
        ids.append(gid)
        parts.append(_data_node(rng, gid))
    edges = []
    for i in range(len(ids) - 1):
        arrow = rng.choice(ARROWHEADS)
        a, b = ids[i], ids[i + 1]
        edges.append(_interaction(
            rng, f"e{i}b{rng.randrange(4096):03x}",
            (round(rng.uniform(50, 900), 4), round(rng.uniform(50, 700), 4)),
            (round(rng.uniform(50, 900), 4), round(rng.uniform(50, 700), 4)),
            ref0=a, ref1=b, arrow=arrow))
    return _pathway(rng, "".join(parts + edges))


def island_elbow_curved(rng) -> str:
    connector = rng.choice(["Elbow", "Curved"])
    n0 = f"s{rng.randrange(4096):03x}"
    n1 = f"t{rng.randrange(4096):03x}"
    c0 = (round(rng.uniform(100, 300), 4), round(rng.uniform(100, 300), 4))
    c1 = (round(rng.uniform(400, 900), 4), round(rng.uniform(300, 700), 4))
    sides = {
        "top": (("0.0", "-1.0"), (0, -10)),
        "bottom": (("0.0", "1.0"), (0, 10)),
        "left": (("-1.0", "0.0"), (-40, 0)),
        "right": (("1.0", "0.0"), (40, 0)),
    }
    s0 = rng.choice(list(sides))
    s1 = rng.choice(list(sides))
    (rel0, off0), (rel1, off1) = sides[s0], sides[s1]
    body = _data_node(rng, n0, x=c0[0], y=c0[1]) + \
        _data_node(rng, n1, x=c1[0], y=c1[1])
    pts = (
        f'      <Point X="{c0[0] + off0[0]}" Y="{c0[1] + off0[1]}" '
        f'GraphRef="{n0}" RelX="{rel0[0]}" RelY="{rel0[1]}" />\n'
        f'      <Point X="{c1[0] + off1[0]}" Y="{c1[1] + off1[1]}" '
        f'GraphRef="{n1}" RelX="{rel1[0]}" RelY="{rel1[1]}" '
        f'ArrowHead="{rng.choice(ARROWHEADS)}" />')
    edge = (
        f'  <Interaction GraphId="ec{rng.randrange(4096):03x}">\n'
        f'    <Graphics ZOrder="12288" LineThickness="1.0" '
        f'ConnectorType="{connector}">\n{pts}\n    </Graphics>\n'
        f'    <Xref Database="" ID="" />\n  </Interaction>\n')
    return _pathway(rng, body + edge)


def island_hyperedge(rng) -> str:
    n0 = f"h{rng.randrange(4096):03x}"
    anchor_id = f"a{rng.randrange(4096):03x}"
    e_main = f"m{rng.randrange(4096):03x}"
    y = round(rng.uniform(60, 100), 4)
    main = _interaction(rng, e_main, (30.0, y), (300.0, y),
                        anchors=((round(rng.uniform(0.2, 0.8), 6),
                                  anchor_id, ""),))
    cx = round(rng.uniform(100, 260), 4)
    cy = y + 80
    node = _data_node(rng, n0, x=cx, y=cy)
    hyper = (
        f'  <Interaction GraphId="y{rng.randrange(4096):03x}">\n'
        f'    <Graphics ZOrder="12288" LineThickness="1.0">\n'
        f'      <Point X="{cx}" Y="{cy - 10}" GraphRef="{n0}" RelX="0.0" '
        f'RelY="-1.0" />\n'
        f'      <Point X="{cx}" Y="{y}" GraphRef="{anchor_id}" RelX="0.0" '
        f'RelY="0.0" ArrowHead="mim-catalysis" />\n'
        f"    </Graphics>\n"
        f'    <Xref Database="" ID="" />\n'
        f"  </Interaction>\n")
    return _pathway(rng, main + node + hyper)


def island_groups(rng) -> str:
    style = rng.choice(["None", "Group", "Complex", "Pathway"])
    group_id = f"g{rng.randrange(4096):03x}"
    graph_id = f"gg{rng.randrange(4096):03x}"
    members = "".join(
        _data_node(rng, f"m{i}{rng.randrange(256):02x}",
                   x=200 + 90 * i, y=300, group_ref=group_id)
        for i in range(rng.randrange(2, 5)))
    group = (f'  <Group GroupId="{group_id}" GraphId="{graph_id}" '
             f'Style="{style}" />\n')
    return _pathway(rng, members + group)


def island_states(rng) -> str:
    parent = f"p{rng.randrange(4096):03x}"
    state = f"st{rng.randrange(4096):03x}"
    body = _data_node(rng, parent, x=300, y=200)
    ds, xid = _xref(rng)
    body += (
        f'  <State GraphRef="{parent}" TextLabel="P" GraphId="{state}">\n'
        f'    <Graphics RelX="1.0" RelY="1.0" Width="15.0" Height="15.0" '
        f'ShapeType="Oval" />\n'
        f'    <Xref Database="{ds}" ID="{xid}" />\n'
        f"  </State>\n")
    return _pathway(rng, body)


def island_labels_shapes(rng) -> str:
    body = (
        f'  <Label TextLabel="Note {rng.randrange(100)}" '
        f'GraphId="l{rng.randrange(4096):03x}">\n'
        f'    <Graphics CenterX="{round(rng.uniform(60, 900), 4)}" '
        f'CenterY="{round(rng.uniform(60, 700), 4)}" Width="120.0" '
        f'Height="25.0" ZOrder="28672" FillColor="ffffff" FontSize="12" '
        f'Valign="Middle" />\n  </Label>\n'
        f'  <Shape GraphId="sh{rng.randrange(4096):03x}">\n'
        f'    <Attribute Key="org.pathvisio.CellularComponentProperty" '
        f'Value="Mitochondria" />\n'
        f'    <Graphics CenterX="{round(rng.uniform(100, 800), 4)}" '
        f'CenterY="{round(rng.uniform(100, 600), 4)}" Width="200.0" '
        f'Height="100.0" ZOrder="16384" FontSize="10" Valign="Middle" '
        f'ShapeType="Mitochondria" LineThickness="3.0" Color="c0c0c0" '
        f'Rotation="0.0" />\n  </Shape>\n')
    return _pathway(rng, body)


def island_publication_xrefs(rng) -> str:
    refs = []
    bp = []
    for i in range(rng.randrange(1, 4)):
        rid = f"{rng.randrange(16**3):03x}"
        refs.append(rid)
        year = rng.randrange(1980, 2025)
        # NOTE: deliberately rdf:id (lowercase) — the GPML bug the reference
        # fixes up before parsing (2013a/toPvjson.ts:163-167)
        bp.append(
            f'    <bp:PublicationXref xmlns:bp="http://www.biopax.org/'
            f'release/biopax-level3.owl#" xmlns:rdf="http://www.w3.org/'
            f'1999/02/22-rdf-syntax-ns#" rdf:id="{rid}">\n'
            f"      <bp:ID>{rng.randrange(10**7, 10**8)}</bp:ID>\n"
            f"      <bp:DB>PubMed</bp:DB>\n"
            f"      <bp:TITLE>Study {i} &amp; follow-up</bp:TITLE>\n"
            f"      <bp:SOURCE>J Synth Biol</bp:SOURCE>\n"
            f"      <bp:YEAR>{year}</bp:YEAR>\n"
            f"      <bp:AUTHORS>Doe J</bp:AUTHORS>\n"
            f"      <bp:AUTHORS>Roe R</bp:AUTHORS>\n"
            f"    </bp:PublicationXref>\n")
    node_id = f"px{rng.randrange(4096):03x}"
    ds, xid = _xref(rng)
    node = (
        f'  <DataNode TextLabel="Cited" GraphId="{node_id}" Type="Protein">\n'
        + "".join(f"    <BiopaxRef>{r}</BiopaxRef>\n" for r in refs)
        + f'    <Graphics CenterX="200.0" CenterY="200.0" Width="80.0" '
        f'Height="20.0" ZOrder="32768" FontSize="10" Valign="Middle" />\n'
        f'    <Xref Database="{ds}" ID="{xid}" />\n'
        f"  </DataNode>\n")
    vocab = (
        '    <bp:openControlledVocabulary xmlns:bp="http://www.biopax.org/'
        'release/biopax-level3.owl#">\n'
        "      <bp:TERM>signaling pathway</bp:TERM>\n"
        f"      <bp:ID>PW:{rng.randrange(10**7):07d}</bp:ID>\n"
        "      <bp:Ontology>Pathway Ontology</bp:Ontology>\n"
        "    </bp:openControlledVocabulary>\n")
    biopax = "  <Biopax>\n" + "".join(bp) + vocab + "  </Biopax>\n"
    return _pathway(rng, node + biopax)


def island_malformed(rng) -> str:
    """Truncated XML exercising the quarantine path."""
    good = island_data_nodes(rng)
    return good[: len(good) // 2] + "</Pathway>"


def island_full_pathway(rng) -> str:
    """WP-scale document (~40-90 entities): nodes with xrefs, typed edges
    with anchors, a hyperedge, groups, states, labels/shapes, citations —
    the composition shape of the reference's 14 full WP fixtures."""
    parts = []
    n_nodes = rng.randrange(15, 35)
    node_ids = []
    for i in range(n_nodes):
        gid = f"fn{i:02d}{rng.randrange(4096):03x}"
        node_ids.append(gid)
        parts.append(_data_node(rng, gid,
                                x=round(60 + (i % 6) * 150
                                        + rng.uniform(-20, 20), 4),
                                y=round(80 + (i // 6) * 110
                                        + rng.uniform(-15, 15), 4)))
    # chain of typed edges + one anchor/hyperedge pair
    edge_ids = []
    anchor_id = f"fa{rng.randrange(4096):03x}"
    for i in range(min(n_nodes - 1, rng.randrange(8, 18))):
        gid = f"fe{i:02d}{rng.randrange(4096):03x}"
        edge_ids.append(gid)
        a, b = node_ids[i], node_ids[i + 1]
        anchors = ((round(rng.uniform(0.3, 0.7), 6), anchor_id, ""),) \
            if i == 0 else ()
        parts.append(_interaction(
            rng, gid,
            (round(rng.uniform(50, 900), 4), round(rng.uniform(50, 700), 4)),
            (round(rng.uniform(50, 900), 4), round(rng.uniform(50, 700), 4)),
            ref0=a, ref1=b, arrow=rng.choice(ARROWHEADS),
            connector=rng.choice([None, "Elbow", "Curved"]),
            anchors=anchors))
    # hyperedge onto the first edge's anchor
    hx = round(rng.uniform(100, 500), 4)
    parts.append(
        f'  <Interaction GraphId="fh{rng.randrange(4096):03x}">\n'
        f'    <Graphics ZOrder="12288" LineThickness="1.0">\n'
        f'      <Point X="{hx}" Y="400.0" GraphRef="{node_ids[-1]}" '
        f'RelX="0.0" RelY="-1.0" />\n'
        f'      <Point X="{hx}" Y="300.0" GraphRef="{anchor_id}" RelX="0.0" '
        f'RelY="0.0" ArrowHead="mim-catalysis" />\n'
        f"    </Graphics>\n"
        f'    <Xref Database="" ID="" />\n'
        f"  </Interaction>\n")
    # a group over two nodes
    group_id = f"fg{rng.randrange(4096):03x}"
    parts.append(_data_node(rng, f"fm1{rng.randrange(256):02x}", x=700, y=500,
                            group_ref=group_id))
    parts.append(_data_node(rng, f"fm2{rng.randrange(256):02x}", x=790, y=500,
                            group_ref=group_id))
    parts.append(f'  <Group GroupId="{group_id}" '
                 f'GraphId="fgg{rng.randrange(256):02x}" '
                 f'Style="{rng.choice(["Complex", "Group", "None"])}" />\n')
    # a state on the first node
    parts.append(
        f'  <State GraphRef="{node_ids[0]}" TextLabel="P" '
        f'GraphId="fs{rng.randrange(4096):03x}">\n'
        f'    <Graphics RelX="1.0" RelY="-1.0" Width="15.0" Height="15.0" '
        f'ShapeType="Oval" />\n'
        f'    <Xref Database="" ID="" />\n'
        f"  </State>\n")
    # citations
    rid = f"{rng.randrange(16**3):03x}"
    parts.append(
        '  <Biopax>\n'
        f'    <bp:PublicationXref xmlns:bp="http://www.biopax.org/release/'
        f'biopax-level3.owl#" xmlns:rdf="http://www.w3.org/1999/02/'
        f'22-rdf-syntax-ns#" rdf:id="{rid}">\n'
        f"      <bp:ID>{rng.randrange(10**7, 10**8)}</bp:ID>\n"
        "      <bp:DB>PubMed</bp:DB>\n"
        "      <bp:TITLE>Full pathway study</bp:TITLE>\n"
        "      <bp:SOURCE>J Synth Biol</bp:SOURCE>\n"
        f"      <bp:YEAR>{rng.randrange(1990, 2025)}</bp:YEAR>\n"
        "      <bp:AUTHORS>Doe J</bp:AUTHORS>\n"
        "    </bp:PublicationXref>\n"
        "  </Biopax>\n")
    return _pathway(rng, "".join(parts),
                    name=f"Full pathway {rng.randrange(1, 10**5)} "
                         f"(synthetic)")


FAMILIES = [
    ("data-nodes", island_data_nodes),
    ("interactions", island_interactions),
    ("elbow-curved", island_elbow_curved),
    ("hyperedge", island_hyperedge),
    ("groups", island_groups),
    ("states", island_states),
    ("labels-shapes", island_labels_shapes),
    ("publication-xrefs", island_publication_xrefs),
    ("full-pathway", island_full_pathway),
    ("malformed", island_malformed),
]

# family sampling weights: malformed is rare
_FAMILY_WEIGHTS = [12, 14, 10, 8, 8, 8, 8, 6, 2, 1]

# bump when generator output changes — part of the corpus cache key.
# v4: content identical to v3; physical layout changed to 512-row row
# groups so ray.data.read_parquet(override_num_blocks=...) can split
# shards evenly (single-row-group shards forced whole-file bundling —
# a 2x block-size imbalance that straggled the last task wave);
# v5: equal-sized shards (target 2000 rows) for even read blocks;
# v6: <a href> outlinks wrapped around prose words (Zipf host targets)
# for the host link-graph / host-PageRank ops — extracted text, islands
# and therefore every kg_* output are IDENTICAL to v5 (tag-strip keeps
# the word; anchors draw from rng after islands/paragraphs)
GEN_VERSION = 6

_EPOCH = datetime.datetime(2024, 1, 1)


def gen_page(i: int, seed: int = SEED) -> dict:
    rng = _rng_for(i, seed)
    lang = rng.choices(["en", "de", "fr"], weights=[90, 5, 5])[0]

    # ~8% of pages are re-crawls of page i-1 (same content, later ts) —
    # exercises exact dedup; ~10% have no islands at all.
    if i > 0 and rng.random() < 0.08:
        prev = gen_page(i - 1, seed)
        return {
            "url": prev["url"],
            "warc_ts": prev["warc_ts"] + datetime.timedelta(days=30),
            "html": prev["html"],
            "text": prev["text"],
            "lang": prev["lang"],
        }

    n_islands = rng.choices([0, 1, 2, 3], weights=[10, 70, 15, 5])[0]
    fam_names = []
    islands = []
    for _ in range(n_islands):
        fam, gen = rng.choices(FAMILIES, weights=_FAMILY_WEIGHTS)[0]
        fam_names.append(fam)
        header = rng.choices([0, 1, 2, 3], weights=[70, 10, 10, 10])[0]
        island = gen(rng)
        # vary the header on the island already produced with header 0
        for h in HEADERS:
            if h and island.startswith(h):
                island = island[len(h):]
        islands.append(HEADERS[header] + island)

    fam_label = "+".join(fam_names) or "no-island"
    # 7 source hosts (deterministic by index) so the host link graph is
    # a real bipartite-ish 7×20 structure, not a single-source star
    url = f"https://crawl{i % 7:02d}.synthetic.test/{fam_label}/{i}"
    paragraphs = [_prose(rng, lang, rng.randrange(1, 4))
                  for _ in range(rng.randrange(1, 5))]
    title = _prose(rng, lang, 1)

    body_parts = []
    for j, p in enumerate(paragraphs):
        body_parts.append(f"<p>{_linkify(rng, p)}</p>")
        if j < len(islands):
            body_parts.append(
                f'<div class="gpml-island" data-i="{j}">{islands[j]}</div>')
    for island in islands[len(paragraphs):]:
        body_parts.append(f'<div class="gpml-island">{island}</div>')

    page_html = (
        "<html><head>"
        f"<title>{title}</title>"
        "<script>var x = 1 < 2;</script>"
        "<style>body { color: #333 }</style>"
        "</head><body>"
        + "".join(body_parts)
        + "</body></html>")

    # oracle text: exactly what extract_text must produce, constructed
    # independently from the prose pieces
    text = " ".join([title] + paragraphs)

    ts = _EPOCH + datetime.timedelta(seconds=(i * 37) % (365 * 86400))
    return {"url": url, "warc_ts": ts, "html": page_html.encode("utf-8"),
            "text": text, "lang": lang}


PAGES_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us")),
    ("html", pa.binary()),
    ("text", pa.string()),
    ("lang", pa.string()),
])


def _write_shard(args) -> str:
    out_dir, shard, start, end, seed = args
    rows = [gen_page(i, seed) for i in range(start, end)]
    table = pa.Table.from_pylist(rows, schema=PAGES_SCHEMA)
    path = os.path.join(out_dir, f"pages-{shard:05d}.parquet")
    pq.write_table(table, path, row_group_size=512)
    return path


def write_pages_parquet(out_dir: str, n_pages: int, seed: int = SEED,
                        rows_per_file: int = 2000) -> str:
    """Write the synthetic corpus as a directory of parquet shards; returns
    out_dir. Cached: if the directory already has a _DONE marker for the same
    (n_pages, seed), it is reused. Shards are generated in parallel
    (deterministic: each shard derives only from (row index, seed)).

    Shards are EQUAL-SIZED (the remainder is spread one row per shard, not
    dumped in a short tail file): ray.data.read_parquet bundles whole files
    into blocks, so uneven shards become uneven blocks, which become
    straggler map tasks in the last wave. rows_per_file is a target; the
    realized size is n_pages/ceil(n_pages/target)."""
    marker = os.path.join(out_dir, f"_DONE_{n_pages}_{seed}_v{GEN_VERSION}")
    if os.path.exists(marker):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    n_shards = max(1, -(-n_pages // rows_per_file))
    base, extra = divmod(n_pages, n_shards)
    jobs = []
    start = 0
    for shard in range(n_shards):
        end = start + base + (1 if shard < extra else 0)
        jobs.append((out_dir, shard, start, end, seed))
        start = end
    if len(jobs) > 2:
        from concurrent.futures import ProcessPoolExecutor
        with ProcessPoolExecutor(max_workers=min(16, len(jobs))) as pool:
            list(pool.map(_write_shard, jobs))
    else:
        for job in jobs:
            _write_shard(job)
    with open(marker, "w") as f:
        f.write("ok")
    return out_dir


def pages_to_warc(parquet_dir: str, out_dir: str,
                  compress: bool = False) -> str:
    """Re-export a parquet pages corpus as WARC shards (one .warc per
    parquet shard; .warc.gz when compress=True) — the actual
    Common-Crawl wire format (ISO 28500 / WARC 1.1 layout: response
    records, Content-Length-delimited, HTTP payload). WARC-Date carries
    microsecond precision so warc_ts round-trips exactly. Driver-side
    utility for interop/testing, the counterpart of pages_to_ndjson."""
    import glob as _glob
    import gzip as _gzip
    import hashlib as _hashlib

    import pyarrow.parquet as _pq

    os.makedirs(out_dir, exist_ok=True)
    shards = sorted(_glob.glob(os.path.join(parquet_dir, "*.parquet")))
    for shard in shards:
        tbl = _pq.read_table(shard, columns=["url", "warc_ts", "html"])
        chunks = []
        for row in tbl.to_pylist():
            html = row["html"]
            http = (b"HTTP/1.1 200 OK\r\n"
                    b"Content-Type: text/html; charset=UTF-8\r\n"
                    + b"Content-Length: %d\r\n\r\n" % len(html)
                    + html)
            rid = _hashlib.sha1(
                (row["url"] + row["warc_ts"].isoformat()).encode()) \
                .hexdigest()
            headers = (
                "WARC/1.0\r\n"
                "WARC-Type: response\r\n"
                f"WARC-Record-ID: <urn:sha1:{rid}>\r\n"
                f"WARC-Date: {row['warc_ts'].isoformat()}Z\r\n"
                f"WARC-Target-URI: {row['url']}\r\n"
                "Content-Type: application/http; msgtype=response\r\n"
                f"Content-Length: {len(http)}\r\n\r\n")
            chunks.append(headers.encode() + http + b"\r\n\r\n")
        data = b"".join(chunks)
        base = os.path.splitext(os.path.basename(shard))[0]
        if compress:
            with open(os.path.join(out_dir, base + ".warc.gz"),
                      "wb") as f:
                f.write(_gzip.compress(data))
        else:
            with open(os.path.join(out_dir, base + ".warc"), "wb") as f:
                f.write(data)
    return out_dir


def pages_to_ndjson(parquet_dir: str, out_dir: str) -> str:
    """Re-export a parquet pages corpus as newline-delimited JSON shards
    (one .ndjson per parquet shard) — the alternate ingest format
    `pipelines.kg.read_pages_ndjson` consumes. warc_ts serializes as
    ISO-8601 seconds; html (binary) as its UTF-8 text. Driver-side
    utility for interop/testing, not a pipeline stage."""
    import glob as _glob
    import json as _json

    import pyarrow.parquet as _pq

    os.makedirs(out_dir, exist_ok=True)
    shards = sorted(_glob.glob(os.path.join(parquet_dir, "*.parquet")))
    for shard in shards:
        tbl = _pq.read_table(shard)
        name = os.path.splitext(os.path.basename(shard))[0] + ".ndjson"
        with open(os.path.join(out_dir, name), "w") as f:
            for row in tbl.to_pylist():
                # full ISO-8601 incl. microseconds — whole-second
                # strftime silently truncated sub-second captures and
                # flipped latest_pages_dataset winners across formats
                row["warc_ts"] = row["warc_ts"].isoformat()
                row["html"] = row["html"].decode("utf-8")
                f.write(_json.dumps(row) + "\n")
    return out_dir
