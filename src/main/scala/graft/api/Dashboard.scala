package graft.api

/** Static single-file dashboard over the four data routes — the engine-side
  * counterpart of the reference's `frontend.html` (a ~1,400-line static page
  * consuming /api/var, /api/il, /api/mev, /api/transfers). Kept deliberately
  * minimal: no external assets, no frameworks, four canvas charts + summary
  * tiles drawn by ~40 lines of inline script, so the whole page ships as one
  * string from [[ApiServer]].
  */
object Dashboard {

  val Html: String =
    """<!doctype html>
      |<html lang="en">
      |<head>
      |<meta charset="utf-8">
      |<title>graft — DeFi risk analytics</title>
      |<style>
      |  :root { color-scheme: light dark; }
      |  body { font: 14px/1.5 system-ui, sans-serif; margin: 2rem auto;
      |         max-width: 1100px; padding: 0 1rem; }
      |  h1 { font-size: 1.4rem; } h2 { font-size: 1.05rem; margin: 0 0 .4rem; }
      |  .grid { display: grid; grid-template-columns: repeat(auto-fit, minmax(480px, 1fr));
      |          gap: 1.2rem; }
      |  .card { border: 1px solid color-mix(in srgb, currentColor 25%, transparent);
      |          border-radius: 8px; padding: 1rem; }
      |  .kpi { font-variant-numeric: tabular-nums; opacity: .8; margin: .3rem 0 .6rem; }
      |  .legend { font-size: .85em; opacity: .7; margin-top: .3rem; }
      |  .legend .sw { color: #4a7dbd; }
      |  .hover { font-size: .85em; font-variant-numeric: tabular-nums;
      |           min-height: 1.3em; opacity: .9; }
      |  canvas { width: 100%; height: 180px; cursor: crosshair; }
      |  .err { color: #c00; }
      |</style>
      |</head>
      |<body>
      |<h1>graft — DeFi risk analytics</h1>
      |<p>Live views over <code>/api/var</code>, <code>/api/il</code>,
      |<code>/api/mev</code>, <code>/api/transfers</code>
      |(<a href="/api/health">health</a>).</p>
      |<div class="grid">
      |  <div class="card"><h2>Historical VaR — price path</h2>
      |    <div class="kpi" id="var-kpi"></div><canvas id="var-chart"></canvas>
      |    <div class="legend" id="var-chart-legend"></div>
      |    <div class="hover" id="var-chart-hover"></div></div>
      |  <div class="card"><h2>Impermanent loss vs price ratio</h2>
      |    <div class="kpi" id="il-kpi"></div><canvas id="il-chart"></canvas>
      |    <div class="legend" id="il-chart-legend"></div>
      |    <div class="hover" id="il-chart-hover"></div></div>
      |  <div class="card"><h2>MEV exposure by block</h2>
      |    <div class="kpi" id="mev-kpi"></div><canvas id="mev-chart"></canvas>
      |    <div class="legend" id="mev-chart-legend"></div>
      |    <div class="hover" id="mev-chart-hover"></div></div>
      |  <div class="card"><h2>Hourly ERC-20 transfer volume</h2>
      |    <div class="kpi" id="tx-kpi"></div><canvas id="tx-chart"></canvas>
      |    <div class="legend" id="tx-chart-legend"></div>
      |    <div class="hover" id="tx-chart-hover"></div></div>
      |</div>
      |<script>
      |const css = getComputedStyle(document.body);
      |function ctx(id) {
      |  const c = document.getElementById(id);
      |  c.width = c.clientWidth; c.height = c.clientHeight;
      |  return c.getContext('2d');
      |}
      |const num = v => Number(v).toLocaleString(undefined,
      |  {maximumFractionDigits: 2});
      |function series(id, ys, kind, name, labels) {
      |  const g = ctx(id), w = g.canvas.width, h = g.canvas.height, pad = 6;
      |  if (!ys.length) return;
      |  const lo = Math.min(0, ...ys), hi = Math.max(...ys, lo + 1e-9);
      |  const x = i => pad + i * (w - 2 * pad) / Math.max(1, ys.length - 1);
      |  const y = v => h - pad - (v - lo) * (h - 2 * pad) / (hi - lo);
      |  function draw(mark) {
      |    g.clearRect(0, 0, w, h);
      |    g.strokeStyle = g.fillStyle = '#4a7dbd'; g.lineWidth = 1.5;
      |    if (kind === 'bars') {
      |      const bw = Math.max(1, (w - 2 * pad) / ys.length - 1);
      |      ys.forEach((v, i) => g.fillRect(pad + i * (bw + 1), y(v), bw, y(lo) - y(v)));
      |      if (mark != null) {
      |        g.fillStyle = '#d08770';
      |        g.fillRect(pad + mark * (bw + 1), y(ys[mark]), bw, y(lo) - y(ys[mark]));
      |      }
      |    } else {
      |      g.beginPath();
      |      ys.forEach((v, i) => i ? g.lineTo(x(i), y(v)) : g.moveTo(x(0), y(v)));
      |      g.stroke();
      |      if (mark != null) {
      |        g.fillStyle = '#d08770';
      |        g.beginPath(); g.arc(x(mark), y(ys[mark]), 3.5, 0, 7); g.fill();
      |      }
      |    }
      |  }
      |  draw(null);
      |  const lg = document.getElementById(id + '-legend');
      |  if (lg) lg.innerHTML = '<span class="sw">&#9644;</span> ' + name +
      |    ' &nbsp;&middot;&nbsp; min ' + num(Math.min(...ys)) +
      |    ' &nbsp;&middot;&nbsp; max ' + num(Math.max(...ys)) +
      |    ' &nbsp;&middot;&nbsp; ' + ys.length + ' points';
      |  const hv = document.getElementById(id + '-hover');
      |  g.canvas.onmousemove = ev => {
      |    const i = Math.max(0, Math.min(ys.length - 1,
      |      Math.round((ev.offsetX - pad) / (w - 2 * pad) * (ys.length - 1))));
      |    if (hv) hv.textContent =
      |      (labels && labels[i] != null ? labels[i] : '#' + i) +
      |      ': ' + num(ys[i]);
      |    draw(i);
      |  };
      |  g.canvas.onmouseleave = () => { if (hv) hv.textContent = ''; draw(null); };
      |}
      |function kpi(id, parts) {
      |  document.getElementById(id).textContent = parts.join('  ·  ');
      |}
      |function fail(id, e) {
      |  document.getElementById(id).innerHTML =
      |    '<span class="err">unavailable: ' + e + '</span>';
      |}
      |const usd = v => '$' + Number(v).toLocaleString(undefined,
      |  {maximumFractionDigits: 0});
      |fetch('/api/var').then(r => r.json()).then(d => {
      |  kpi('var-kpi', ['VaR95 ' + usd(d.summary.var95),
      |    'CVaR95 ' + usd(d.summary.cvar95), 'position ' + usd(d.summary.positionUsd)]);
      |  series('var-chart', d.points.map(p => p.price), 'line',
      |    'price (USD)', d.points.map(p => p.label));
      |}).catch(e => fail('var-kpi', e));
      |fetch('/api/il').then(r => r.json()).then(d => {
      |  const worst = d.points.reduce((a, p) => Math.min(a, p.ilPct), 0);
      |  kpi('il-kpi', ['worst IL ' + worst.toFixed(2) + '%',
      |    d.points.length + ' ratio points']);
      |  series('il-chart', d.points.map(p => p.ilPct), 'line',
      |    'IL (%)', d.points.map(p => p.ratio + 'x'));
      |}).catch(e => fail('il-kpi', e));
      |fetch('/api/mev').then(r => r.json()).then(d => {
      |  kpi('mev-kpi', ['avg ' + d.summary.avgScore.toFixed(1),
      |    'max ' + d.summary.maxScore.toFixed(1),
      |    d.summary.highRiskBlocks + ' high-risk blocks']);
      |  series('mev-chart', d.rows.map(r => r.score), 'bars',
      |    'MEV score (0-100)', d.rows.map(r => r.block + ' ' + r.band));
      |}).catch(e => fail('mev-kpi', e));
      |fetch('/api/transfers').then(r => r.json()).then(d => {
      |  kpi('tx-kpi', [d.summary.totalTransfers + ' transfers',
      |    d.summary.erc20Transfers + ' ERC-20']);
      |  series('tx-chart', d.points.map(p => p.erc20Vol), 'bars',
      |    'ERC-20 volume (ETH)', d.points.map(p => p.hourLabel));
      |}).catch(e => fail('tx-kpi', e));
      |</script>
      |</body>
      |</html>
      |""".stripMargin
}
