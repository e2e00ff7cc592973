// Test-support micro-oracle: the reference's raw-value predicates
// evaluated by a real JS engine, for tests/test_js_differential.py.
// Transcribed from the spec at the cited lines of
// /root/reference/src/domain/QueryEngine.ts.
//
// Protocol: JSONL on stdin; per line either
//   {"op":"wildcard","value":<fieldVal>,"pattern":<pattern>}
//   {"op":"score","doc":{...},"query":{...}}
// emits JSONL {"r": <bool|number>}.

import { createInterface } from 'node:readline';

// QueryEngine.ts:1393-1403
function testWildcard(fieldVal, pattern) {
  if (typeof fieldVal !== 'string') return false;
  const regexStr = '^' + pattern.split('').map((ch) => {
    if (ch === '*') return '.*';
    if (ch === '?') return '.';
    return ch.replace(/[-/\\^$+?.()|[\]{}]/g, '\\$&');
  }).join('') + '$';
  return new RegExp(regexStr, 'i').test(fieldVal);
}

// QueryEngine.ts:1441-1513, single-leaf slice (match/term/prefix/
// wildcard/fuzzy): token = the query value (wildcards stripped for
// wildcard queries), counted as \b-bounded 'gi' matches over
// JSON.stringify(doc).toLowerCase(), min score 1
function computeScore(doc, query) {
  if (!query) return 1;
  const text = JSON.stringify(doc).toLowerCase();
  let tokens = [];
  for (const kind of ['match', 'term', 'prefix', 'wildcard', 'fuzzy']) {
    if (query[kind]) {
      let v = query[kind].value;
      if (v == null) continue;
      v = String(v);
      if (kind === 'wildcard') v = v.replace(/[\*\?]/g, '');
      tokens = [v.toLowerCase()];
      break;
    }
  }
  if (tokens.length === 0) return 1;
  let score = 0;
  for (const t of tokens) {
    if (!t) continue;
    const regex = new RegExp(
      `\\b${t.replace(/[.*+?^${}()|[\]\\]/g, '\\$&')}\\b`, 'gi',
    );
    const matches = text.match(regex);
    if (matches) score += matches.length;
  }
  return Math.max(1, score);
}

// QueryEngine.ts:1350-1382 — the naive scan's dict-form term/match
// doc test, single named-field slice (typeof-string guard, substring
// include + whitespace-token equality at fuzziness 0)
function stringFieldMatch(fieldVal, value, fuzziness) {
  if (typeof fieldVal !== 'string') return false;
  const a = fieldVal.toLowerCase();
  const b = String(value).toLowerCase();
  if (!fuzziness || fuzziness <= 0) {
    if (a.includes(b)) return true;
    const tokens = a.split(/\s+/);
    return tokens.includes(b);
  }
  const fieldTokens = a.split(/\s+/);
  const queryTokens = b.split(/\s+/);
  return queryTokens.every((qt) =>
    fieldTokens.some((ft) => levRef(ft, qt) <= fuzziness));
}

function levRef(a, b) { return lev(a, b); }

// QueryProcessor.ts:298-328 / QueryEngine.ts:892-905 — a range
// condition is a bare JS relational operator over the raw doc value
// and bound (abstract relational comparison: both-strings → code-unit
// order, else ToNumber with NaN comparisons false)
function rangeRel(a, b, rel) {
  if (rel === '<') return a < b;
  if (rel === '<=') return a <= b;
  if (rel === '>') return a > b;
  return a >= b;
}

const rl = createInterface({ input: process.stdin, terminal: false });
rl.on('line', (line) => {
  if (!line.trim()) return;
  const q = JSON.parse(line);
  const r = q.op === 'sfm'
    ? stringFieldMatch(q.value, q.needle, q.fuzziness || 0)
    : q.op === 'wildcard'
    ? testWildcard(q.value, q.pattern)
    : q.op === 'bm25'
      ? bm25(q)
      : q.op === 'detect'
        ? detectKeywordOrText(q.value, q.fieldName)
        : q.op === 'custom'
          ? customAnalyzer(q.text, q.options, q.stopwords || [])
          : q.op === 'phrase'
            ? checkPhrase(q.docTokens, q.phraseTokens, q.slop,
                          q.fuzziness || 0)
            : q.op === 'lev'
              ? lev(q.a, q.b)
              : q.op === 'numstr'
                ? numstr(q.rep)
                : q.op === 'stringify'
                  ? JSON.stringify(q.doc)
                  : q.op === 'docfilter'
                    ? applyFilter(q.doc, q.config)
                    : q.op === 'iso'
                      ? new Date(q.ms).toISOString()
                      : q.op === 'dateparse'
                        ? (isNaN(Date.parse(q.s)) ? null
                           : Date.parse(q.s))
                        : q.op === 'rel'
                          ? rangeRel(q.a, q.b, q.rel)
                          : computeScore(q.doc, q.query);
  process.stdout.write(JSON.stringify({ r }) + '\n');
});

// SearchEngine.ts:1078-1101 — the filter-aggregation doc predicate
// (verbatim semantics: strict ===, truthy-guarded substring include,
// typeof-number range)
export function applyFilter(doc, filterConfig) {
  if (filterConfig.term) {
    const field = filterConfig.term.field;
    const value = filterConfig.term.value;
    return doc[field] === value;
  } else if (filterConfig.match) {
    const field = filterConfig.match.field;
    const value = filterConfig.match.value;
    return Boolean(doc[field]
      && doc[field].toString().toLowerCase()
        .includes(value.toLowerCase()));
  } else if (filterConfig.range) {
    const field = filterConfig.range.field;
    const docValue = doc[field];
    if (typeof docValue !== 'number') return false;
    if (filterConfig.range.gte !== undefined
        && docValue < filterConfig.range.gte) return false;
    if (filterConfig.range.gt !== undefined
        && docValue <= filterConfig.range.gt) return false;
    if (filterConfig.range.lte !== undefined
        && docValue > filterConfig.range.lte) return false;
    if (filterConfig.range.lt !== undefined
        && docValue >= filterConfig.range.lt) return false;
    return true;
  }
  return true;
}

// ECMA Number::toString / JSON number serialization — the semantics
// String(val) bucket keys (SearchEngine.ts:993, FacetEngine.ts:116)
// and the JSON.stringify tf-fallback render (SearchEngine.ts:589-604)
// leak into output.  rep is a Python repr ('nan'/'inf'/'-inf'
// sentinels for the non-finite values JSON can't carry).
export function numstr(rep) {
  let v;
  if (rep === 'nan') v = NaN;
  else if (rep === 'inf') v = Infinity;
  else if (rep === '-inf') v = -Infinity;
  else v = Number(rep);
  return [String(v), JSON.stringify(v)];
}

// BM25Scorer.ts:84-117 — exported for the numeric differential
export function bm25(q) {
  const { tf, df, totalDocs, dl, avgdl, k1, b, boost } = q;
  if (df === 0) return 0;
  const idf = Math.log((totalDocs - df + 0.5) / (df + 0.5) + 1);
  const a = avgdl || 1;
  const numerator = tf * (k1 + 1);
  const denominator = tf + k1 * (1 - b + b * (dl / a));
  return Math.max(0, boost * idf * (numerator / denominator));
}

// MappingsManager.ts:454-505 — string field-type detection
export function detectKeywordOrText(value, fieldName) {
  if (/^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Z|a-z]{2,}$/.test(value)) {
    return 'email';
  }
  if (/^https?:\/\/.+/.test(value)) return 'url';
  if (/^\d{4}-\d{2}-\d{2}$/.test(value)
      || /^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}/.test(value)) {
    return 'date';
  }
  if (!isNaN(Number(value)) && value.trim() !== '') return 'number';
  if (fieldName) {
    const lower = fieldName.toLowerCase();
    const pats = ['name', 'title', 'description', 'content', 'text',
      'summary', 'city', 'country', 'address', 'street', 'location',
      'comment', 'note', 'message', 'subject', 'body', 'caption',
      'label', 'tag', 'category'];
    for (const p of pats) if (lower.includes(p)) return 'text';
  }
  if (value.length > 100) return 'text';
  if (value.includes(' ') && value.trim().split(/\s+/).length > 1) {
    return 'text';
  }
  return 'keyword';
}

// Tokenizer.ts:421-470 — configurable analyzer, default (non-
// customPattern) chain
export function customAnalyzer(text, options, stopwords) {
  const {
    lowercase = true,
    removeStopwords = true,
    minLength = 1,
    maxLength = Infinity,
    preserveHyphens = false,
    preserveApostrophes = false,
  } = options || {};
  const sw = new Set(stopwords);
  let processed = text;
  if (lowercase) processed = processed.toLowerCase();
  if (!preserveApostrophes) processed = processed.replace(/'/g, ' ');
  if (!preserveHyphens) processed = processed.replace(/-/g, ' ');
  processed = processed
    .replace(/[^\w\s]/g, ' ')
    .replace(/\s+/g, ' ')
    .trim();
  return processed.split(' ')
    .filter(Boolean)
    .filter((token) => {
      if (removeStopwords && sw.has(token)) return false;
      if (token.length < minLength || token.length > maxLength) {
        return false;
      }
      return true;
    });
}

// QueryProcessor.ts:29-51 — the UTF-16 DP both proximity variants use
export function lev(str1, str2) {
  const m = [];
  for (let i = 0; i <= str2.length; i++) m[i] = [i];
  for (let j = 0; j <= str1.length; j++) m[0][j] = j;
  for (let i = 1; i <= str2.length; i++) {
    for (let j = 1; j <= str1.length; j++) {
      if (str2.charAt(i - 1) === str1.charAt(j - 1)) {
        m[i][j] = m[i - 1][j - 1];
      } else {
        m[i][j] = Math.min(m[i - 1][j - 1] + 1, m[i][j - 1] + 1,
                           m[i - 1][j] + 1);
      }
    }
  }
  return m[str2.length][str1.length];
}

// QueryProcessor.ts:579-617 (exact) / :619-661 (fuzzy: window widens
// by fuzziness and token equality becomes lev <= fuzziness)
export function checkPhrase(docTokens, phraseTokens, slop, fuzziness) {
  if (phraseTokens.length === 0) return true;
  if (docTokens.length < phraseTokens.length) return false;
  const P = phraseTokens.map((t) => t.toLowerCase());
  const D = docTokens.map((t) => t.toLowerCase());
  const extra = slop + (fuzziness || 0);
  for (let i = 0; i <= D.length - P.length; i++) {
    let matches = 0;
    let maxGap = 0;
    let last = i - 1;
    for (let j = 0; j < P.length; j++) {
      let found = false;
      for (let k = Math.max(last + 1, i + j);
           k < Math.min(D.length, i + j + extra + 1); k++) {
        const hit = fuzziness
          ? lev(P[j], D[k]) <= fuzziness
          : D[k] === P[j];
        if (hit) {
          matches++;
          maxGap = Math.max(maxGap, k - last - 1);
          last = k;
          found = true;
          break;
        }
      }
      if (!found) break;
    }
    if (matches === P.length && maxGap <= slop) return true;
  }
  return false;
}
