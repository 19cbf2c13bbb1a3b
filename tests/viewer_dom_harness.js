// Minimal DOM shim that EXECUTES the generated viewer's script —
// routing, page rendering, badge generation — against a real exported
// data.json. Driven by tests/test_viewer_dom.py under node; prints
// CHECK lines the pytest side asserts.
//
// Usage: node viewer_dom_harness.js <site_dir>
const fs = require('fs');
const path = require('path');

const siteDir = process.argv[2];
const DATAJSON = JSON.parse(
  fs.readFileSync(path.join(siteDir, 'data.json')));
const html = fs.readFileSync(path.join(siteDir, 'index.html'), 'utf8');
const js = html.split('<script>')[1].split('</script>')[0];

function makeEl() {
  return {
    _html: undefined, _tc: '', className: '', hash: '',
    set innerHTML(v) { this._html = v; },
    get innerHTML() {
      return this._html !== undefined ? this._html : this._tc;
    },
    set textContent(v) { this._tc = v; },
    get textContent() { return this._tc; },
    children: [],
    set href(h) { this.hash = h; },
    get href() { return this.hash; },
    get firstChild() { return this._fc || (this._fc = makeEl()); },
    appendChild(c) { this.children.push(c); },
    querySelectorAll() { return []; },
    classList: { toggle() {} },
    addEventListener() {},
  };
}
const els = { nav: makeEl(), view: makeEl(), q: makeEl(), stats: makeEl() };
global.document = {
  getElementById: (id) => els[id],
  createElement: () => makeEl(),
};
global.location = {
  hash: '',
  replace(h) { this.hash = h; console.log('CHECK redirect ' + h); },
};
global.window = { addEventListener() {} };
global.fetch = () => Promise.resolve({
  json: () => Promise.resolve(DATAJSON),
});

// strict-mode script: exports needed for driving must be re-bound
eval(js + '\nglobal.route = route; global.colBadges = colBadges;' +
  '\nglobal.safeUrl = safeUrl; global.esc = esc;');

setTimeout(() => {
  const cat = Object.keys(DATAJSON.catalogs)[0];
  const db = Object.keys(DATAJSON.catalogs[cat].databases)[0];
  const tables = Object.keys(
    DATAJSON.catalogs[cat].databases[db].tables);

  location.hash = '#' + cat;
  route();
  console.log('CHECK catalog-lists-db ' +
    els.view.innerHTML.includes(db));

  location.hash = '#' + cat + '/' + db;
  route();
  console.log('CHECK db-lists-table ' +
    els.view.innerHTML.includes(tables[0]));

  location.hash = '#' + [cat, db, tables[0]].join('/');
  route();
  const t = els.view.innerHTML;
  console.log('CHECK table-renders ' +
    (t.includes('Partitions') || t.includes('Schema')));
  console.log('CHECK crumbs ' + t.includes('#' + cat + '"'));

  // badge rendering + tooltip copy, straight from the live function
  const b = colBadges({ readonly: true, filter_only: true,
                        has_stats: true });
  console.log('CHECK badges ' + (
    b.includes('Read-only') && b.includes('Filter-only') &&
    b.includes('Stats') &&
    b.includes('You cannot use this column for filtering.')));

  // escaping: quotes must not survive esc(); hostile URLs refused
  console.log('CHECK esc-quotes ' +
    (esc('a"b\'c') === 'a&quot;b&#39;c'));
  console.log('CHECK safe-url ' + (
    safeUrl('javascript:alert(1)') === null &&
    safeUrl('https://example.com/nb') === 'https://example.com/nb'));

  console.log('CHECK done true');
}, 30);
