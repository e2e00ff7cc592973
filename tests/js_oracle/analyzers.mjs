// Test-support micro-oracle: the reference's analyzer semantics
// evaluated by a real JS engine, used by tests/test_js_differential.py
// to differential-fuzz the Python ports in
// search_engine_ray/analysis/analyzers.py (which documents the same
// chains).  Each chain is transcribed from the spec at the cited
// lines of /root/reference/src/domain/Tokenizer.ts; running it under
// node gives the ACTUAL JS regex/URL/trim semantics (ASCII \w,
// JS whitespace class, WHATWG URL parsing, UTF-16 lengths) instead of
// a Python approximation of them.
//
// Protocol: JSONL on stdin, one {text, stopwords?} per line; JSONL on
// stdout, one {<analyzer>: [tokens...]} per line.

import { createInterface } from 'node:readline';

const analyzers = {
  // Tokenizer.ts:176-192
  standard(text, sw) {
    return text
      .toLowerCase()
      .replace(/(\w+)'(\w+)/g, '$1 $2')
      .replace(/(\w+)'s\b/g, '$1')
      .replace(/(\w+)s'\b/g, '$1s')
      .replace(/[^\w\s\-\.]/g, ' ')
      .replace(/\.+/g, ' ')
      .replace(/\-+/g, ' ')
      .replace(/\s+/g, ' ')
      .trim()
      .split(' ')
      .filter(Boolean)
      .filter((t) => !sw.has(t) && t.length > 1);
  },
  // Tokenizer.ts:197-206
  simple(text, sw) {
    return text
      .toLowerCase()
      .replace(/[^\w\s]/g, ' ')
      .replace(/\s+/g, ' ')
      .trim()
      .split(' ')
      .filter(Boolean)
      .filter((t) => !sw.has(t));
  },
  // Tokenizer.ts:211-216
  whitespace(text, sw) {
    return text
      .split(/\s+/)
      .filter(Boolean)
      .filter((t) => !sw.has(t.toLowerCase()));
  },
  // Tokenizer.ts:221-223
  keyword(text) {
    return text.trim() ? [text.trim()] : [];
  },
  // Tokenizer.ts:228-243
  pattern(text, sw) {
    const out = [];
    const rx = /\b[\w'-]+\b/g;
    let m;
    while ((m = rx.exec(text)) !== null) {
      const t = m[0].toLowerCase();
      if (t.length > 1 && !sw.has(t)) out.push(t);
    }
    return out;
  },
  // Tokenizer.ts:248-276
  email(text, sw) {
    const out = [];
    const rx = /\b[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Z|a-z]{2,}\b/g;
    let m;
    while ((m = rx.exec(text)) !== null) {
      const email = m[0].toLowerCase();
      out.push(email);
      const [local, domain] = email.split('@');
      if (local && local.length > 1) out.push(local);
      if (domain && domain.length > 1) {
        out.push(domain);
        for (const part of domain.split('.')) {
          if (part.length > 1) out.push(part);
        }
      }
    }
    return out.filter((t) => !sw.has(t));
  },
  // Tokenizer.ts:281-323
  url(text, sw) {
    const out = [];
    const rx = /https?:\/\/[^\s]+/g;
    let m;
    while ((m = rx.exec(text)) !== null) {
      const url = m[0].toLowerCase();
      out.push(url);
      try {
        const u = new URL(url);
        if (u.hostname) {
          out.push(u.hostname);
          for (const part of u.hostname.split('.')) {
            if (part.length > 1) out.push(part);
          }
        }
        if (u.pathname && u.pathname !== '/') {
          for (const part of u.pathname.split('/').filter(Boolean)) {
            if (part.length > 1) out.push(part);
          }
        }
      } catch {
        /* unparseable: keep only the raw match */
      }
    }
    return out.filter((t) => !sw.has(t));
  },
  // Tokenizer.ts:328-381 (no stopword filter; Set-dedup at the end)
  phone(text) {
    const out = [];
    const rx = /((\+\d{1,3}[-.\s]?)?(\(\d{3}\)|\d{3})[-.\s]?\d{3}[-.\s]?\d{4})/g;
    let m;
    while ((m = rx.exec(text)) !== null) {
      const phone = m[0];
      out.push(phone);
      const digits = phone.replace(/\D/g, '');
      if (digits.length >= 10) {
        out.push(digits);
        const intl = digits.length > 10;
        const area = intl
          ? digits.substring(digits.length - 10, digits.length - 7)
          : digits.substring(0, 3);
        if (area) out.push(area);
        const middle = intl
          ? digits.substring(digits.length - 7, digits.length - 4)
          : digits.substring(3, 6);
        if (middle) out.push(middle);
        const last = digits.substring(digits.length - 4);
        if (last) out.push(last);
      }
    }
    if (out.length === 0 && /^\d{3,4}$/.test(text.trim())) {
      out.push(text.trim());
    }
    return [...new Set(out)];
  },
};

// Tokenizer.ts:386-396 — Set-union of four chains, insertion order
analyzers.advanced = (text, sw) =>
  [...new Set([
    ...analyzers.standard(text, sw),
    ...analyzers.email(text, sw),
    ...analyzers.url(text, sw),
    ...analyzers.phone(text, sw),
  ])];

const rl = createInterface({ input: process.stdin, terminal: false });
rl.on('line', (line) => {
  if (!line.trim()) return;
  const { text, stopwords } = JSON.parse(line);
  const sw = new Set(stopwords || []);
  const res = {};
  for (const [name, fn] of Object.entries(analyzers)) {
    res[name] = fn(text, sw);
  }
  process.stdout.write(JSON.stringify(res) + '\n');
});
