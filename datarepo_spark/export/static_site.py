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
  /* Radix-themes-inspired tokens matching the reference app's
     Theme appearance='dark' accentColor='blue' (pages/index.tsx);
     gray/blue steps approximate @radix-ui/themes dark scales. A
     light scheme stays available for prefers-color-scheme: light. */
  :root { --fg: #edeef0; --muted: #9ba1a6; --line: #2a2d31;
          --accent: #70b8ff; --accent-solid: #0090ff; --bg: #111113;
          --panel: #18191b; --chip: #212225; --hover: #1c1d1f;
          --warn: #f0b05a; --warnbg: #3a2c13; --info: #70b8ff;
          --infobg: #12283d; --shadow: rgba(0,0,0,.35); }
  @media (prefers-color-scheme: light) {
    :root { --fg: #1c2024; --muted: #60646c; --line: #e0e1e6;
            --accent: #0b6bcb; --accent-solid: #0090ff; --bg: #ffffff;
            --panel: #f9f9fb; --chip: #f0f0f3; --hover: #f4f5f7;
            --warn: #a15c07; --warnbg: #fdf0d9; --info: #0b6bcb;
            --infobg: #e3effb; --shadow: rgba(0,0,0,.08); }
  }
  * { box-sizing: border-box; }
  body { margin: 0; background: var(--bg); color: var(--fg);
         font: 14px/1.5 -apple-system, BlinkMacSystemFont, 'Segoe UI',
         Roboto, system-ui, sans-serif;
         -webkit-font-smoothing: antialiased; }
  header { padding: 10px 20px; border-bottom: 1px solid var(--line);
           display: flex; gap: 14px; align-items: center;
           background: var(--panel); position: sticky; top: 0; }
  header h1 { font-size: 16px; margin: 0; letter-spacing: -.01em; }
  #stats { font-size: 12px; }
  #qwrap { margin-left: auto; position: relative; }
  #q { padding: 7px 54px 7px 12px; border: 1px solid var(--line);
       border-radius: 6px; background: var(--bg); color: var(--fg);
       min-width: 280px; font-size: 13px; outline: none; }
  #q:focus { border-color: var(--accent-solid);
             box-shadow: 0 0 0 2px var(--infobg); }
  #qwrap kbd { position: absolute; right: 8px; top: 50%;
       transform: translateY(-50%); font: 11px/1 inherit;
       color: var(--muted); border: 1px solid var(--line);
       border-radius: 4px; padding: 2px 5px; background: var(--chip);
       pointer-events: none; }
  main { display: grid; grid-template-columns: 280px 1fr; min-height:
         calc(100vh - 57px); }
  nav { border-right: 1px solid var(--line); padding: 12px;
        overflow-y: auto; background: var(--panel); }
  nav .cat a, nav .db a { text-decoration: none; color: inherit; }
  nav .cat { padding: 10px 8px 0; font-weight: 500; color: var(--muted);
             text-transform: uppercase; font-size: 11px;
             letter-spacing: .04em; }
  nav .db { padding: 2px 8px 6px; font-weight: 700; font-size: 15px;
            letter-spacing: -.01em; }
  nav .cat a:hover, nav .db a:hover { color: var(--accent); }
  /* RadioCards.Item look (reference Sidebar.tsx): bordered card rows */
  nav a.tbl { display: block; padding: 8px 12px; margin: 4px 0;
          color: var(--fg); text-decoration: none; font-size: 13px;
          border: 1px solid var(--line); border-radius: 6px;
          background: var(--bg); }
  nav a.tbl:hover { border-color: var(--accent-solid);
          background: var(--hover); }
  nav a.tbl.active { border-color: var(--accent-solid);
          box-shadow: inset 0 0 0 1px var(--accent-solid); }
  section { padding: 24px 32px; overflow-x: auto; max-width: 980px; }
  h2 { margin: 0 0 4px; font-size: 24px; letter-spacing: -.015em; }
  h3 { font-size: 15px; margin: 22px 0 6px; }
  .muted { color: var(--muted); }
  .crumbs { margin: 0 0 10px; font-size: 12px; }
  .crumbs a { color: var(--muted); text-decoration: none; }
  .crumbs a:hover { color: var(--accent); }
  .chip { display: inline-block; background: var(--chip); border-radius:
          4px; padding: 2px 8px; margin-right: 6px; font-size: 12px;
          color: var(--muted); vertical-align: middle; }
  .badge { display: inline-block; border-radius: 4px; padding: 1px 7px;
           margin-left: 6px; font-size: 11px; font-weight: 500;
           cursor: help; vertical-align: middle; }
  .badge.warn { color: var(--warn); background: var(--warnbg); }
  .badge.info { color: var(--info); background: var(--infobg); }
  table { border-collapse: collapse; margin-top: 12px; width: 100%;
          border: 1px solid var(--line); border-radius: 8px; }
  th, td { text-align: left; padding: 8px 12px; border-bottom: 1px solid
           var(--line); font-size: 13px; }
  tr:last-child td { border-bottom: none; }
  tr:hover td { background: var(--hover); }
  th { color: var(--muted); font-weight: 500; font-size: 12px;
       background: var(--panel); }
  code { background: var(--chip); padding: 1px 6px; border-radius: 4px;
         font-family: ui-monospace, 'SF Mono', Menlo, Consolas,
         monospace; font-size: 12px; }
  pre { background: var(--panel); border: 1px solid var(--line);
        padding: 14px 16px; border-radius: 8px; overflow-x: auto;
        box-shadow: 0 1px 3px var(--shadow); }
  pre code { background: none; padding: 0; font-size: 12.5px;
             line-height: 1.6; }
  ul.cards { list-style: none; margin: 12px 0 0; padding: 0; }
  ul.cards li { border: 1px solid var(--line); border-radius: 8px;
                padding: 12px 16px; margin-bottom: 10px;
                background: var(--panel); }
  ul.cards li:hover { border-color: var(--accent-solid); }
  ul.cards a { color: var(--accent); text-decoration: none;
               font-weight: 600; }
</style>
</head>
<body>
<header><h1>datarepo</h1>
  <span class="muted" id="stats"></span>
  <span id="qwrap">
    <input id="q" placeholder="Search tables…" autocomplete="off">
    <kbd>⌘K</kbd>
  </span>
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
// search shortcuts: '/' and mod+k, matching the reference's
// FuzzySearchBox useHotkeys(['/', 'mod+k']) binding
window.addEventListener("keydown", (e) => {
  const mod = e.metaKey || e.ctrlKey;
  if ((e.key === "/" && !mod) || (e.key.toLowerCase() === "k" && mod)) {
    if (document.activeElement !== q) {
      e.preventDefault();
      if (q.focus) q.focus();
    }
  }
});
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
