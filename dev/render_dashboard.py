#!/usr/bin/env python3
"""Render the graft dashboard's four panels to an SVG from the LIVE API.

Dev-side documentation tool (like dev/compare.py — NOT part of the engine):
the sandbox has no browser to screenshot the real page
(src/main/scala/graft/api/Dashboard.scala), so this draws the same four
panels from the same four JSON routes the page consumes. Every number in
the output came over HTTP from a running `graft.api.ApiServer`.

Usage:  sbt "runMain graft.api.ApiServer 5005" &   # wait for "listening"
        python3 dev/render_dashboard.py http://127.0.0.1:5005 docs/dashboard.svg
"""
import json
import sys
import urllib.request

BASE = sys.argv[1] if len(sys.argv) > 1 else "http://127.0.0.1:5005"
OUT = sys.argv[2] if len(sys.argv) > 2 else "docs/dashboard.svg"

def get(path):
    with urllib.request.urlopen(BASE + path) as r:
        return json.load(r)

var_d, il_d, mev_d, tx_d = (get(p) for p in
                            ("/api/var", "/api/il", "/api/mev", "/api/transfers"))

W, H, PW, PH, PAD = 1180, 560, 560, 240, 20
BLUE, AMBER, GRID, TXT, MUT = "#4a7dbd", "#c08a2d", "#ddd", "#222", "#777"

def polyline(xs, ys, x0, y0, w, h, ymin, ymax, color, width=1.5):
    span = (ymax - ymin) or 1.0
    pts = " ".join(
        f"{x0 + w * i / max(len(xs) - 1, 1):.1f},"
        f"{y0 + h - h * (y - ymin) / span:.1f}"
        for i, y in enumerate(ys) if y is not None)
    return (f'<polyline fill="none" stroke="{color}" '
            f'stroke-width="{width}" points="{pts}"/>')

def bars(ys, x0, y0, w, h, ymax, color):
    bw = w / max(len(ys), 1)
    out = []
    for i, y in enumerate(ys):
        bh = h * y / (ymax or 1)
        out.append(f'<rect x="{x0 + i * bw + 0.5:.1f}" y="{y0 + h - bh:.1f}" '
                   f'width="{max(bw - 1, 1):.1f}" height="{bh:.1f}" '
                   f'fill="{color}"/>')
    return "".join(out)

def panel(px, py, title, kpi, body, legend):
    return (f'<g transform="translate({px},{py})">'
            f'<rect width="{PW}" height="{PH}" rx="8" fill="white" '
            f'stroke="{GRID}"/>'
            f'<text x="14" y="24" font-size="15" font-weight="600" '
            f'fill="{TXT}">{title}</text>'
            f'<text x="14" y="44" font-size="12" fill="{MUT}">{kpi}</text>'
            f'{body}<text x="14" y="{PH - 10}" font-size="11" '
            f'fill="{MUT}">{legend}</text></g>')

# VaR: price path + rolling VaR series
vp = var_d["points"]
prices = [p["price"] for p in vp]
vars_ = [p["varUsd"] for p in vp]
vsum = var_d["summary"]
gx, gy, gw, gh = 14, 56, PW - 28, PH - 110
var_body = (
    polyline(vp, prices, gx, gy, gw, gh, min(prices), max(prices), BLUE) +
    polyline(vp, vars_, gx, gy, gw, gh,
             min(v for v in vars_ if v is not None),
             max(v for v in vars_ if v is not None), AMBER))
var_kpi = (f'VaR95 ${vsum["var95"]:,.0f} · CVaR95 ${vsum["cvar95"]:,.0f} · '
           f'position ${vsum["positionUsd"]:,.0f} · {vsum["returnsUsed"]} returns')

# IL: il% vs ratio
ip = il_d["points"]
ils = [p["ilPct"] for p in ip]
il_body = polyline(ip, ils, gx, gy, gw, gh, min(ils), max(ils), BLUE)
kp = il_d["keyPoints"].get("2.0") or next(iter(il_d["keyPoints"].values()))
il_kpi = (f'{len(ip)} ratio points · IL at 2.0x = {kp["ilPct"]:.2f}% · '
          f'LP ${kp["lpValue"]:,.0f} vs hold ${kp["holdValue"]:,.0f}')

# MEV: score bars
mr = mev_d["rows"]
scores = [r["score"] for r in mr]
msum = mev_d["summary"]
mev_body = bars(scores, gx, gy, gw, gh, max(scores), BLUE)
mev_kpi = (f'avg {msum["avgScore"]:.1f} · max {msum["maxScore"]:.1f} · '
           f'{msum["highRiskBlocks"]} high-risk of {msum["blocksAnalyzed"]} blocks')

# Transfers: hourly volume bars
tp = tx_d["points"]
vols = [p["erc20Vol"] for p in tp]
tsum = tx_d["summary"]
tx_body = bars(vols, gx, gy, gw, gh, max(vols), AMBER)
tx_kpi = (f'{tsum["totalTransfers"]:,} transfers · '
          f'{tsum["uniqueContracts"]} contracts · '
          f'{tsum["totalVolumeEth"]:,.0f} ETH total')

svg = f"""<svg xmlns="http://www.w3.org/2000/svg" width="{W}" height="{H}"
  font-family="system-ui, sans-serif">
<rect width="{W}" height="{H}" fill="#fafafa"/>
<text x="{PAD}" y="30" font-size="19" font-weight="700" fill="{TXT}">graft
 &#8212; DeFi risk analytics</text>
<text x="{PAD}" y="48" font-size="12" fill="{MUT}">rendered from live
 /api/var · /api/il · /api/mev · /api/transfers responses</text>
{panel(PAD, 60, "Historical VaR — price path", var_kpi, var_body,
       "price (blue) · rolling 30-day VaR (amber)")}
{panel(PAD * 2 + PW, 60, "Impermanent loss vs price ratio", il_kpi, il_body,
       "IL% across 0.1x–5x price ratios")}
{panel(PAD, 60 + PH + PAD, "MEV exposure by block", mev_kpi, mev_body,
       "composite score per sampled block")}
{panel(PAD * 2 + PW, 60 + PH + PAD, "Hourly ERC-20 transfer volume", tx_kpi,
       tx_body, "volume (ETH) per hour of day")}
</svg>
"""
import os
os.makedirs(os.path.dirname(OUT) or ".", exist_ok=True)
with open(OUT, "w") as f:
    f.write(svg)
print(f"wrote {OUT}: {len(svg)} bytes from {BASE}")
