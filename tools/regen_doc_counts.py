#!/usr/bin/env python3
"""Regenerate README.md's derived counts (registered queries from
SparkEntry; tests/suites from target/test-reports after a FULL
`sbt test`). The gate lints these via tools/selfcheck.py
(GRAFT_ENFORCE_TEST_COUNTS=1) — this is the fixer half.
"""
import glob
import os
import re
import xml.etree.ElementTree as ET

root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
entry = open(os.path.join(root, "src/main/scala/graft/SparkEntry.scala")).read()
n_queries = len(set(re.findall(r'"(q\d+[a-z0-9_]*)"\s*->', entry)))
reports = glob.glob(os.path.join(root, "target/test-reports/*.xml"))
suites = len(reports)
tests = sum(int(ET.parse(r).getroot().get("tests", "0")) for r in reports)

p = os.path.join(root, "README.md")
s = open(p).read()
s2 = re.sub(r"All \d+ registered queries", f"All {n_queries} registered queries", s)
# only trust test-report counts when they look like a FULL `sbt test`
# run (a scoped testOnly leaves a handful of files)
if reports and suites >= 50:
    s2 = re.sub(r"# \d+ tests / \d+ suites", f"# {tests} tests / {suites} suites", s2)
else:
    print("test-reports look partial — tests/suites line left untouched")
open(p, "w").write(s2)
print(f"queries={n_queries} tests={tests} suites={suites} "
      f"({'changed' if s2 != s else 'already current'})")
