#!/usr/bin/env python3
"""Regenerate docs/OPERATORS.md from SparkEntry.scala: one row per
oracled query, title taken from the `// --- ... ---` banner above the
query definition, summary from the remaining comment lines."""
import re

s = open('src/main/scala/graft/SparkEntry.scala', encoding='utf-8').read()
pat = re.compile(r'((?:[ ]*//[^\n]*\n)+)?[ ]*"(q_[a-z0-9_]+)" -> \(\(s', re.M)
entries = []
for m in pat.finditer(s):
    comment = (m.group(1) or '')
    lines = [re.sub(r'^\s*//\s?', '', l)
             for l in comment.strip().split('\n') if l.strip()]
    title, desc = '', []
    for l in lines:
        t = re.match(r'-+\s*(.*?)\s*-+$', l)
        if t and not title:
            title = t.group(1)
        else:
            desc.append(l)
    entries.append((m.group(2), title, ' '.join(desc)))

out = ['# Operator index (generated from SparkEntry.scala; one row per oracled query)', '',
       'Every row is a `queries()` entry with a matching `oracleSql` entry,',
       'green in the latest both-scale correctness sweep. Regenerate with',
       '`python3 scripts/gen_operator_index.py`.', '',
       '| query | operator | summary |', '|---|---|---|']
for name, title, desc in entries:
    d = desc.replace('|', '\\|')
    if len(d) > 300:
        d = d[:297] + '...'
    out.append(f'| {name} | {title or "—"} | {d} |')
open('docs/OPERATORS.md', 'w', encoding='utf-8').write('\n'.join(out) + '\n')
print(f'wrote docs/OPERATORS.md ({len(entries)} queries)')
