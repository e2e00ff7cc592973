// Empirically derive the non-unicode /i-flag canonicalization classes
// of this JS engine: for every BMP codepoint, find which case-related
// codepoints a single-char /x/i regex matches. Output: JSON map
// cp -> class representative (min cp of the class), identity omitted.
const esc = (ch) => ch.replace(/[-/\\^$+?.()|[\]{}*]/g, '\\$&');
const parent = new Map();
const find = (x) => { let r = x; while (parent.has(r) && parent.get(r) !== r) r = parent.get(r); return r; };
const union = (a, b) => { const ra = find(a), rb = find(b); if (ra !== rb) parent.set(Math.max(ra, rb), Math.min(ra, rb)); };
for (let cp = 0; cp < 0x10000; cp++) {
  if (cp >= 0xD800 && cp <= 0xDFFF) continue;
  const c = String.fromCharCode(cp);
  const cands = new Set([c.toLowerCase(), c.toUpperCase(),
    c.toLowerCase().toUpperCase(), c.toUpperCase().toLowerCase()]);
  for (const x of cands) {
    if (x.length !== 1 || x === c) continue;
    let rx;
    try { rx = new RegExp('^' + esc(c) + '$', 'i'); } catch { continue; }
    if (rx.test(x)) { parent.set(cp, cp); parent.set(x.charCodeAt(0), parent.get(x.charCodeAt(0)) ?? x.charCodeAt(0)); union(cp, x.charCodeAt(0)); }
  }
}
const out = {};
for (const cp of [...parent.keys()].sort((a, b) => a - b)) {
  const r = find(cp);
  if (r !== cp) out[cp] = r;
}
console.log(JSON.stringify(out));
