"""SVG taxonomy-tree rendering for the `svgtaxtree` goal.

Reference equivalent: core match/TaxTreePainter.java (Batik-based connected
line drawing with per-node k-mer/evolutionary-distance-proportional
indentation). This is a dependency-free SVG writer transcribing the same
geometry (paintTree:104-217): tree-order rows, per-level running indent
widths, vertical/horizontal connector lines with last-child shortening,
dashed strokes above the large-distance threshold, the longest path marked
red, requested nodes bold, and the reference's node label format
(getNodeText:338-364). Font metrics are approximated (no AWT here):
ascent = 0.8 * size, descent = 0.25 * size.
"""

from __future__ import annotations

from xml.sax.saxutils import escape

from genestrip_tpu.report.reporter import compute_distances


def _fmt_d(x: float) -> str:
    """ref TaxTreePainter.DF = DecimalFormat("0.######")."""
    if x != x:
        return "NaN"
    s = f"{x:.6f}".rstrip("0").rstrip(".")
    return s if s else "0"


def write_svg_taxtree(project, db, path) -> None:
    p = project
    tree = db.tree
    stats = db.stats()
    font = p["svgFont"]
    font_size = p["svgFontSize"]
    ascent = int(round(0.8 * font_size))
    descent = int(round(0.25 * font_size))
    font_height = ascent + descent
    line_h = int(round(p["svgLineHeightFactor"] * font_height))
    std_indent = int(round(p["svgIndentFactor"] * line_h))
    x_text_gap = int(p["svgTextGapFactor"] * line_h)
    node_indent_factor = p["svgKmerNodeIndentFactor"]
    by_distance = p["svgDistanceIndent"]
    bold_req = p["svgReqNodesBold"]
    show_rank = p["svgShowRank"]
    show_dist = p["svgShowDistance"]
    show_portion = p["svgShowDistancePortion"]
    large_thresh = p["svgTooLargeDistance"]
    mark_longest = p["svgMarkLongestPath"]
    stroke_w = font_height / 10.0

    n = len(tree)
    dist, portion, branch = compute_distances(tree, stats, db.k)
    max_kmers = max((stats.get(t, 0) for t in tree.taxids if t), default=0) or 1

    # children lists for isLastChild (ref :281-297)
    children: list[list[int]] = [[] for _ in range(n)]
    for i in range(1, n):
        children[int(tree.parent[i])].append(i)

    def is_last_child(i: int) -> bool:
        par = int(tree.parent[i])
        return par < 0 or children[par][-1] == i

    def indent_for_node(i: int) -> int:
        if by_distance:
            # distance == 1 gives no useful indentation (ref :305-307)
            d = dist[i]
            if d == 1 or d != d:
                return 0
            dp = portion[i]
            return int(dp * node_indent_factor) if dp == dp else 0
        return int((stats.get(tree.taxids[i], 0) / max_kmers)
                   * node_indent_factor)

    indent_widths = [0] * (int(tree.depth.max(initial=0)) + 2)
    draw_lines = [False] * len(indent_widths)

    def total_indent(level: int) -> int:
        return sum(indent_widths[: level + 1]) + level * std_indent

    body = []
    max_width = 0
    x_line_off = int(line_h * 0.25)
    for c, i in enumerate(range(n)):            # tree order == index order
        level = int(tree.depth[i])
        indent_widths[level] = indent_for_node(i)
        draw_lines[level] = True
        parent_branch = -1
        if mark_longest:
            par = int(tree.parent[i])
            if par >= 0:
                parent_branch = branch[par]
        last_child = is_last_child(i)
        y_top = c * line_h
        for j in range(1, level + 1):
            x_pos = total_indent(j - 1) + x_line_off
            if draw_lines[j]:
                y_bottom = y_top + line_h
                if j == level and last_child:
                    y_bottom -= line_h // 2
                body.append(
                    f'<line x1="{x_pos}" y1="{y_top}" x2="{x_pos}" '
                    f'y2="{y_bottom}" stroke="black" stroke-width="{stroke_w:.1f}"/>')
            if j == level:
                x_end = total_indent(j) - x_text_gap
                y_mid = y_top + line_h // 2
                color = "red" if (mark_longest and i == parent_branch) else "black"
                dash = (f' stroke-dasharray="5,5"'
                        if dist[i] == dist[i] and dist[i] > large_thresh else "")
                body.append(
                    f'<line x1="{x_pos}" y1="{y_mid}" x2="{x_end}" '
                    f'y2="{y_mid}" stroke="{color}" '
                    f'stroke-width="{stroke_w:.1f}"{dash}/>')
        if last_child:
            draw_lines[level] = False

        # label (ref getNodeText:338-364)
        s = stats.get(tree.taxids[i], 0)
        label = f"{tree.names[i]} ({tree.taxids[i]}"
        if show_rank:
            r = tree.rank_name(i)
            if r:
                label += f", {r}"
        label += f") [{s}"
        if show_dist:
            label += f",d={_fmt_d(dist[i])}"
        if show_portion:
            label += f",dp={_fmt_d(portion[i])}"
        label += "]"
        x = total_indent(level)
        y = y_top + (line_h - font_height) // 2 + ascent
        weight = "bold" if (bold_req and tree.requested[i]) else "normal"
        est_w = int(font_size * 0.6 * len(label))
        # white backing rect clears crossing tree lines (ref :208-212)
        body.append(
            f'<rect x="{x}" y="{y - font_height}" width="{est_w + font_height}" '
            f'height="{font_height + descent}" fill="white"/>')
        body.append(
            f'<text x="{x}" y="{y}" font-family="{escape(font)}" '
            f'font-size="{font_size}" font-weight="{weight}">'
            f'{escape(label)}</text>')
        max_width = max(max_width, x + est_w)

    width = max_width + font_height
    height = max(n, 1) * line_h
    with open(path, "w", encoding="utf-8") as f:
        f.write('<?xml version="1.0" encoding="UTF-8"?>\n')
        f.write(f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" '
                f'height="{height}" viewBox="0 0 {width} {height}">\n')
        for ln in body:
            f.write(ln + "\n")
        f.write("</svg>\n")
