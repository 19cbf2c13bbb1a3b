"""Self-contained static catalog browser.

The reference ships a precompiled React bundle and copies it next to
data.json (export/web.py:119-150). Shipping someone else's compiled
bundle is out of scope here, so this module generates a from-scratch,
single-file, dependency-free HTML viewer with the same job: browse
catalogs → databases → tables, inspect columns/partitions/descriptions,
filter by name. It reads the exact data.json ``export_catalogs`` emits.
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
          --accent: #0b6bcb; --bg: #ffffff; --chip: #f1f4f7; }
  @media (prefers-color-scheme: dark) {
    :root { --fg: #e6e9ec; --muted: #9aa5b0; --line: #2c333a;
            --accent: #66b2ff; --bg: #14171a; --chip: #20262c; }
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
  nav .cat { padding: 6px 24px; font-weight: 600; color: var(--muted);
             text-transform: uppercase; font-size: 11px; }
  nav .db { padding: 4px 24px; font-weight: 600; }
  nav a { display: block; padding: 3px 24px 3px 40px; color: var(--fg);
          text-decoration: none; border-left: 2px solid transparent; }
  nav a:hover, nav a.active { color: var(--accent);
          border-left-color: var(--accent); background: var(--chip); }
  section { padding: 20px 28px; overflow-x: auto; }
  h2 { margin: 0 0 4px; } .muted { color: var(--muted); }
  .chip { display: inline-block; background: var(--chip); border-radius:
          10px; padding: 1px 8px; margin-right: 6px; font-size: 12px; }
  table { border-collapse: collapse; margin-top: 12px; width: 100%; }
  th, td { text-align: left; padding: 6px 10px; border-bottom: 1px solid
           var(--line); font-size: 13px; }
  th { color: var(--muted); font-weight: 600; }
  code { background: var(--chip); padding: 1px 5px; border-radius: 4px; }
  pre { background: var(--chip); padding: 12px 14px; border-radius: 8px;
        overflow-x: auto; }
  pre code { background: none; padding: 0; }
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
      c.className = "cat"; c.textContent = t.cname; nav.appendChild(c);
      const d = document.createElement("div");
      d.className = "db"; d.textContent = t.dname; nav.appendChild(d);
    }
    const a = document.createElement("a");
    a.textContent = t.tname;
    a.href = "#" + [t.cname, t.dname, t.tname].map(encodeURIComponent).join("/");
    nav.appendChild(a);
  }
}

function esc(s) {
  const d = document.createElement("div");
  d.textContent = String(s == null ? "" : s);
  return d.innerHTML;
}

function renderTable(cname, dname, tname) {
  const tbl = ((DATA.catalogs[cname] || {}).databases[dname] || {})
    .tables[tname];
  if (!tbl) { view.innerHTML = "<p class=muted>Not found.</p>"; return; }
  let html = `<h2>${esc(tname)}</h2>
    <p class="muted">${esc(cname)} / ${esc(dname)}
      <span class="chip">${esc(tbl.table_type || "table")}</span></p>`;
  if (tbl.description) html += `<p>${esc(tbl.description)}</p>`;
  if ((tbl.partitions || []).length) {
    html += "<h3>Partitions</h3>" + tbl.partitions.map(p =>
      `<span class="chip">${esc(p.column_name)}:
       <code>${esc(p.type_annotation)}</code></span>`).join("");
  }
  if ((tbl.columns || []).length) {
    html += `<h3>Columns</h3><table><tr><th>column</th><th>type</th>
      <th>nullable</th></tr>` + tbl.columns.map(c =>
      `<tr><td>${esc(c.column)}</td><td><code>${esc(c.type)}</code></td>
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
  for (const a of nav.querySelectorAll("a"))
    a.classList.toggle("active", decodeURIComponent(a.hash.slice(1)) ===
      [cname, dname, tname].join("/"));
}

function route() {
  const parts = location.hash.slice(1).split("/").map(decodeURIComponent);
  if (parts.length === 3) renderTable(parts[0], parts[1], parts[2]);
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
