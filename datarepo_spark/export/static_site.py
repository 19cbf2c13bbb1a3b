"""Self-contained static catalog browser.

The reference ships a precompiled React bundle and copies it next to
data.json (export/web.py:119-150). Shipping someone else's compiled
bundle is out of scope here, so this module generates a from-scratch,
single-file, dependency-free HTML viewer with the same job and the same
browse flow as the reference site (static_site/src/router.tsx):

- hash routes ``#catalog`` → ``#catalog/database`` → ``#cat/db/table``,
  with the root redirecting to the first catalog (router.tsx:25-28);
- a catalog page listing its databases, a database page listing its
  tables (pages/[catalogKey]/[databaseKey]/index.tsx sidebar flow);
- a table page with description / data source / latency / example
  notebook, partitions, the generated query snippets, and the
  column-level badges the reference renders from the per-column flags
  in data.json (pages/.../[tableKey]/index.tsx:219-247): Read-only,
  Filter-only, and Stats — tooltip copy matched;
- fuzzy subsequence search over tables/columns/partitions.

It reads the exact data.json ``export_catalogs`` emits.
"""

from __future__ import annotations

INDEX_HTML = """<!doctype html>
<html lang="en">
<head>
<meta charset="utf-8">
<meta name="viewport" content="width=device-width, initial-scale=1">
<title>datarepo catalog</title>
<style>
  :root { --fg: #1a1d21; --muted: #5f6a75; --line: #e3e7eb;
          --accent: #0b6bcb; --bg: #ffffff; --chip: #f1f4f7;
          --warn: #a15c07; --warnbg: #fdf0d9; --info: #0b6bcb;
          --infobg: #e3effb; }
  @media (prefers-color-scheme: dark) {
    :root { --fg: #e6e9ec; --muted: #9aa5b0; --line: #2c333a;
            --accent: #66b2ff; --bg: #14171a; --chip: #20262c;
            --warn: #f0b05a; --warnbg: #3a2c13; --info: #66b2ff;
            --infobg: #12283d; }
  }
  * { box-sizing: border-box; }
  body { margin: 0; background: var(--bg); color: var(--fg);
         font: 14px/1.5 system-ui, sans-serif; }
  header { padding: 16px 24px; border-bottom: 1px solid var(--line);
           display: flex; gap: 16px; align-items: baseline; }
  header h1 { font-size: 18px; margin: 0; }
  #q { margin-left: auto; padding: 6px 10px; border: 1px solid var(--line);
       border-radius: 6px; background: var(--bg); color: var(--fg);
       min-width: 240px; }
  main { display: grid; grid-template-columns: 280px 1fr; min-height:
         calc(100vh - 57px); }
  nav { border-right: 1px solid var(--line); padding: 12px 0;
        overflow-y: auto; }
  nav .cat a, nav .db a { text-decoration: none; color: inherit; }
  nav .cat { padding: 6px 24px; font-weight: 600; color: var(--muted);
             text-transform: uppercase; font-size: 11px; }
  nav .db { padding: 4px 24px; font-weight: 600; }
  nav .cat a:hover, nav .db a:hover { color: var(--accent); }
  nav a.tbl { display: block; padding: 3px 24px 3px 40px; color: var(--fg);
          text-decoration: none; border-left: 2px solid transparent; }
  nav a.tbl:hover, nav a.tbl.active { color: var(--accent);
          border-left-color: var(--accent); background: var(--chip); }
  section { padding: 20px 28px; overflow-x: auto; }
  h2 { margin: 0 0 4px; } .muted { color: var(--muted); }
  .crumbs a { color: var(--muted); text-decoration: none; }
  .crumbs a:hover { color: var(--accent); }
  .chip { display: inline-block; background: var(--chip); border-radius:
          10px; padding: 1px 8px; margin-right: 6px; font-size: 12px; }
  .badge { display: inline-block; border-radius: 4px; padding: 0 6px;
           margin-left: 6px; font-size: 11px; cursor: help; }
  .badge.warn { color: var(--warn); background: var(--warnbg); }
  .badge.info { color: var(--info); background: var(--infobg); }
  table { border-collapse: collapse; margin-top: 12px; width: 100%; }
  th, td { text-align: left; padding: 6px 10px; border-bottom: 1px solid
           var(--line); font-size: 13px; }
  th { color: var(--muted); font-weight: 600; }
  code { background: var(--chip); padding: 1px 5px; border-radius: 4px; }
  pre { background: var(--chip); padding: 12px 14px; border-radius: 8px;
        overflow-x: auto; }
  pre code { background: none; padding: 0; }
  ul.cards { list-style: none; margin: 12px 0 0; padding: 0; }
  ul.cards li { border: 1px solid var(--line); border-radius: 8px;
                padding: 10px 14px; margin-bottom: 8px; }
  ul.cards a { color: var(--accent); text-decoration: none;
               font-weight: 600; }
</style>
</head>
<body>
<header><h1>datarepo catalog</h1>
  <span class="muted" id="stats"></span>
  <input id="q" placeholder="filter tables…" autocomplete="off">
</header>
<main><nav id="nav"></nav><section id="view">
  <p class="muted">Select a table.</p></section></main>
<script>
"use strict";
let DATA = null;
const nav = document.getElementById("nav");
const view = document.getElementById("view");
const q = document.getElementById("q");

function tables() {
  const out = [];
  for (const [cname, cat] of Object.entries(DATA.catalogs || {}))
    for (const [dname, db] of Object.entries(cat.databases || {}))
      for (const [tname, tbl] of Object.entries(db.tables || {}))
        out.push({ cname, dname, tname, tbl });
  return out;
}

function subseq(needle, hay) {
  // fuzzy subsequence: every needle char appears in order in hay
  let i = 0;
  for (const ch of hay) if (ch === needle[i]) i++;
  return i === needle.length;
}

function matches(f, t) {
  // search tables, their columns, and partition names (the reference
  // site indexes databases/tables/columns/partitions via fuse.js; this
  // is the dependency-free equivalent: subsequence match, which
  // subsumes substring match, uniformly on every field)
  if (!f) return true;
  if (subseq(f, t.tname.toLowerCase())) return true;
  for (const c of t.tbl.columns || [])
    if (subseq(f, String(c.column).toLowerCase())) return true;
  for (const p of t.tbl.partitions || [])
    if (subseq(f, String(p.column_name).toLowerCase())) return true;
  return subseq(f, t.dname.toLowerCase());
}

function href(parts) {
  return "#" + parts.map(encodeURIComponent).join("/");
}

function renderNav(filter) {
  nav.innerHTML = "";
  const f = (filter || "").toLowerCase();
  let last = "";
  for (const t of tables()) {
    if (!matches(f, t)) continue;
    const key = t.cname + "/" + t.dname;
    if (key !== last) {
      last = key;
      const c = document.createElement("div");
      c.className = "cat";
      c.innerHTML = `<a href="${href([t.cname])}"></a>`;
      c.firstChild.textContent = t.cname;
      nav.appendChild(c);
      const d = document.createElement("div");
      d.className = "db";
      d.innerHTML = `<a href="${href([t.cname, t.dname])}"></a>`;
      d.firstChild.textContent = t.dname;
      nav.appendChild(d);
    }
    const a = document.createElement("a");
    a.className = "tbl";
    a.textContent = t.tname;
    a.href = href([t.cname, t.dname, t.tname]);
    nav.appendChild(a);
  }
}

function esc(s) {
  // full HTML entity escape INCLUDING quotes: esc() output is also
  // interpolated into double-quoted attribute values (title=, href=),
  // where the textContent->innerHTML trick would leave '"' live and
  // allow attribute breakout from attacker-controlled data.json
  return String(s == null ? "" : s)
    .replace(/&/g, "&amp;").replace(/</g, "&lt;").replace(/>/g, "&gt;")
    .replace(/"/g, "&quot;").replace(/'/g, "&#39;");
}

function safeUrl(u) {
  // only plain web links leave the viewer (javascript:/data: refused)
  return /^https?:\\/\\//i.test(String(u || "")) ? String(u) : null;
}

function markActive(parts) {
  for (const a of nav.querySelectorAll("a.tbl"))
    a.classList.toggle("active", decodeURIComponent(a.hash.slice(1)) ===
      parts.join("/"));
}

function renderCatalog(cname) {
  const cat = DATA.catalogs[cname];
  if (!cat) { view.innerHTML = "<p class=muted>Not found.</p>"; return; }
  const dbs = Object.entries(cat.databases || {});
  let html = `<h2>${esc(cname)}</h2>
    <p class="muted">${dbs.length} database(s)</p><ul class="cards">`;
  for (const [dname, db] of dbs) {
    const n = Object.keys(db.tables || {}).length;
    html += `<li><a href="${href([cname, dname])}">${esc(dname)}</a>
      <span class="muted"> — ${n} table(s)</span></li>`;
  }
  view.innerHTML = html + "</ul>";
  markActive([]);
}

function renderDatabase(cname, dname) {
  const db = ((DATA.catalogs[cname] || {}).databases || {})[dname];
  if (!db) { view.innerHTML = "<p class=muted>Not found.</p>"; return; }
  let html = `<p class="crumbs muted">
      <a href="${href([cname])}">${esc(cname)}</a></p>
    <h2>${esc(dname)}</h2><h3 class="muted">Tables</h3><ul class="cards">`;
  for (const [tname, tbl] of Object.entries(db.tables || {})) {
    html += `<li><a href="${href([cname, dname, tname])}">${esc(tname)}</a>
      <span class="chip">${esc(tbl.table_type || "table")}</span>`;
    if (tbl.description)
      html += `<div class="muted">${esc(tbl.description)}</div>`;
    html += "</li>";
  }
  view.innerHTML = html + "</ul>";
  markActive([]);
}

// column badges — flags exported per column in data.json; tooltip copy
// matches the reference table page (pages/.../[tableKey]/index.tsx)
const BADGES = [
  ["readonly", "warn", "Read-only", "This column is only computed " +
   "after the data is loaded. You cannot use this column for filtering."],
  ["filter_only", "warn", "Filter-only", "This column is only " +
   "available as filters. It will not be in the loaded dataframe."],
  ["has_stats", "info", "Stats", "Adding filters with this column can " +
   "significantly speed up query time by reducing the amount of data " +
   "loaded."],
];

function colBadges(c) {
  let out = "";
  for (const [flag, cls, label, tip] of BADGES)
    if (c[flag]) out +=
      `<span class="badge ${cls}" title="${esc(tip)}">${esc(label)}</span>`;
  return out;
}

function renderTable(cname, dname, tname) {
  const tbl = (((DATA.catalogs[cname] || {}).databases || {})[dname] ||
    {tables: {}}).tables[tname];
  if (!tbl) { view.innerHTML = "<p class=muted>Not found.</p>"; return; }
  let html = `<p class="crumbs muted">
      <a href="${href([cname])}">${esc(cname)}</a> /
      <a href="${href([cname, dname])}">${esc(dname)}</a></p>
    <h2>${esc(tname)}
      <span class="chip">${esc(tbl.table_type || "table")}</span>` +
    (tbl.is_deprecated ?
      `<span class="badge warn" title="This table is deprecated.">` +
      `Deprecated</span>` : "") + `</h2>`;
  if (tbl.description) html += `<p>${esc(tbl.description)}</p>`;
  if (tbl.data_input) html += `<h3 class="muted">Data Source</h3>
    <p class="muted">${esc(tbl.data_input)}</p>`;
  if (tbl.latency_info) html += `<h3 class="muted">Latency</h3>
    <p class="muted">${esc(tbl.latency_info)}</p>`;
  const nb = safeUrl(tbl.example_notebook);
  if (nb) html +=
    `<p><a href="${esc(nb)}" target="_blank" rel="noopener">` +
    `Example Notebook</a></p>`;
  html += "<h3>Partitions</h3>";
  if ((tbl.partitions || []).length) {
    html += tbl.partitions.map(p =>
      `<span class="chip">${esc(p.column_name)}:
       <code>${esc(p.type_annotation)}</code></span>`).join("");
  } else {
    html += `<p class="muted">This table is not partitioned.</p>`;
  }
  if ((tbl.columns || []).length) {
    html += `<h3>Schema</h3><table><tr><th>column</th><th>type</th>
      <th>nullable</th></tr>` + tbl.columns.map(c =>
      `<tr><td>${esc(c.column)}${colBadges(c)}</td>
       <td><code>${esc(c.type)}</code></td>
       <td>${esc(c.nullable)}</td></tr>`).join("") + "</table>";
  }
  if (tbl.code_snippet) {
    html += `<h3>Query this table</h3>
      <pre><code>${esc(tbl.code_snippet)}</code></pre>`;
  }
  if (tbl.code_snippet_sql) {
    html += `<h3>Or with a SQL filter</h3>
      <pre><code>${esc(tbl.code_snippet_sql)}</code></pre>`;
  }
  view.innerHTML = html;
  markActive([cname, dname, tname]);
}

function route() {
  const raw = location.hash.slice(1);
  if (!raw) {
    // root redirect to the first catalog (reference router.tsx:25-28)
    const names = Object.keys(DATA.catalogs || {});
    if (names.length) location.replace(href([names[0]]));
    return;
  }
  const parts = raw.split("/").map(decodeURIComponent);
  if (parts.length === 1) renderCatalog(parts[0]);
  else if (parts.length === 2) renderDatabase(parts[0], parts[1]);
  else renderTable(parts[0], parts[1], parts[2]);
}

fetch("data.json").then(r => r.json()).then(d => {
  DATA = d;
  const n = tables().length;
  document.getElementById("stats").textContent =
    Object.keys(d.catalogs || {}).length + " catalog(s), " + n + " table(s)";
  renderNav("");
  route();
});
q.addEventListener("input", () => renderNav(q.value));
window.addEventListener("hashchange", route);
</script>
</body>
</html>
"""


def write_index_html(output_dir: str) -> str:
    """Write the viewer next to data.json; returns the path."""
    import os

    path = os.path.join(output_dir, "index.html")
    with open(path, "w", encoding="utf-8") as handle:
        handle.write(INDEX_HTML)
    return path
