"""SVG taxonomy-tree rendering for the `svgtaxtree` goal.

Reference equivalent: core match/TaxTreePainter.java (Batik-based SVG with
k-mer/evolutionary-distance-proportional indentation, controlled by the
svg* config keys). This is a dependency-free SVG writer honoring the same
options: indentation per depth plus a k-mer- or distance-proportional extra
indent, bold requested nodes, optional rank/distance annotations.
"""

from __future__ import annotations

from xml.sax.saxutils import escape

from genestrip_tpu.report.reporter import compute_distances


def write_svg_taxtree(project, db, path) -> None:
    p = project
    tree = db.tree
    stats = db.stats()
    font = p["svgFont"]
    font_size = p["svgFontSize"]
    line_h = font_size * p["svgLineHeightFactor"] * 1.4
    indent = font_size * p["svgIndentFactor"]
    kmer_indent = p["svgKmerNodeIndentFactor"]
    by_distance = p["svgDistanceIndent"]
    bold_req = p["svgReqNodesBold"]
    show_rank = p["svgShowRank"]
    show_dist = p["svgShowDistance"]
    show_portion = p["svgShowDistancePortion"]

    n = len(tree)
    dist, portion = compute_distances(tree, stats, db.k)
    max_kmers = max((stats.get(t, 0) for t in tree.taxids), default=1) or 1

    lines = []
    width = 0.0
    for i in range(n):
        extra = 0.0
        if kmer_indent > 0:
            base = dist[i] if by_distance else stats.get(tree.taxids[i], 0) / max_kmers
            if base == base:  # not NaN
                extra = kmer_indent * font_size * base
        x = 10 + int(tree.depth[i]) * indent + extra
        y = 10 + (len(lines) + 1) * line_h
        label = f"{tree.names[i]} ({tree.taxids[i]})"
        if show_rank:
            label += f" [{tree.rank_name(i)}]"
        if show_dist and dist[i] == dist[i]:
            label += f" d={dist[i]:.6f}"
        if show_portion and portion[i] == portion[i]:
            label += f" dp={portion[i]:.6f}"
        weight = "bold" if (bold_req and tree.requested[i]) else "normal"
        lines.append(
            f'<text x="{x:.1f}" y="{y:.1f}" font-family="{escape(font)}" '
            f'font-size="{font_size}" font-weight="{weight}">{escape(label)}</text>')
        width = max(width, x + font_size * 0.6 * len(label))

    height = 20 + (len(lines) + 1) * line_h
    with open(path, "w", encoding="utf-8") as f:
        f.write(f'<svg xmlns="http://www.w3.org/2000/svg" width="{width:.0f}" '
                f'height="{height:.0f}">\n')
        for ln in lines:
            f.write(ln + "\n")
        f.write("</svg>\n")
