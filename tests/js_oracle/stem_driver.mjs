// Test-support driver: runs the reference's GENERATED Snowball
// stemmers (compiled JS, snowballstem.org output) under node so
// tests/test_js_differential.py can differential-fuzz the repo's
// decoded Python ports.  The stemmer directory is passed as argv[2]
// (the test skips when the reference tree is absent), so no reference
// code lives in this repo.
//
// Protocol: JSONL {lang, words: [...]} on stdin → {stems: [...]}.

import { createInterface } from 'node:readline';
import { pathToFileURL } from 'node:url';

const dir = process.argv[2];
const cache = new Map();

async function stemmerFor(lang) {
  if (!cache.has(lang)) {
    cache.set(
      lang,
      import(pathToFileURL(`${dir}/${lang}.js`)).then((m) => m.stemmer),
    );
  }
  return cache.get(lang);
}

const lines = [];
const rl = createInterface({ input: process.stdin, terminal: false });
rl.on('line', (l) => l.trim() && lines.push(l));
rl.on('close', async () => {
  for (const line of lines) {
    const { lang, words } = JSON.parse(line);
    const stem = await stemmerFor(lang);
    // SnowballStemmer.ts:38-49 catches stemmer errors and returns the
    // word unchanged — some generated stemmers (bg.js:48-56) throw on
    // strict-mode string index assignment for real inputs, so the
    // effective reference behavior is "unstemmed" there
    const stems = words.map((w) => {
      try { return stem(w); } catch { return w; }
    });
    process.stdout.write(JSON.stringify({ stems }) + '\n');
  }
});
