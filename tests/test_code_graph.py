"""Code dependency graph: imports / defs / edges / rollup / triples."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graphrag_rs_spark.operators.code_graph import (
    code_triples,
    dependency_edges,
    extract_defs,
    extract_imports,
    module_stem,
    repo_rollup,
)

PY = """\
# import fake_commented
import os
import os
from collections import deque
from functools import wraps
    import indented_not_toplevel

def top(x):
    return x

async def atop():
    pass

class Widget:
    def method(self):  # not top-level
        pass
"""

RS = """\
use crate::parser;
use super::lexer::Token;
use self::util;
pub mod child;
mod private_child;
mod inline_block {
// use crate::commented_out;

pub fn parse(s: &str) -> usize { s.len() }
pub(crate) fn internal() {}
async fn io_task() {}
unsafe fn danger() {}
pub struct Ast { pub id: u64 }
enum Node { Leaf }
pub trait Visit {}
"""

GO = """\
package main

import "fmt"
import (
    "net/http"
    _ "embed"
)

func Handler(w int) {}
func (s *Server) Serve() {}
type Server struct{}
"""

JS = """\
import React from 'react'
import './side-effect.css'
import { useState } from "react"
const _ = require('lodash')

export default function App() {}
export class Store {}
function helper() {}
"""


def _files(spark, rows):
    return spark.createDataFrame(rows, ["repo", "path", "lang", "content"])


@pytest.fixture(scope="module")
def corpus(spark):
    return _files(
        spark,
        [
            ("org/a", "src/main.py", "python", PY),
            ("org/a", "src/parser.rs", "rust", RS),
            ("org/b", "cmd/server.go", "go", GO),
            ("org/b", "web/app.js", "javascript", JS),
            ("org/b", "web/app.ts", "typescript", JS),
            ("org/c", "README.md", "markdown", "# not code\nimport nothing\n"),
        ],
    )


def test_python_imports(spark, corpus):
    got = {
        r["imported"]
        for r in extract_imports(corpus).where(F.col("lang") == "python").collect()
    }
    # commented/indented lines don't match; duplicate `import os` collapses
    assert got == {"os", "collections", "functools"}


def test_rust_imports_and_mods(spark, corpus):
    got = {
        r["imported"]
        for r in extract_imports(corpus).where(F.col("lang") == "rust").collect()
    }
    # `mod inline_block {` (no semicolon) and commented `use` excluded
    assert got == {"parser", "lexer", "util", "child", "private_child"}


def test_go_imports(spark, corpus):
    got = {
        r["imported"]
        for r in extract_imports(corpus).where(F.col("lang") == "go").collect()
    }
    assert got == {"fmt", "net/http", "embed"}


def test_js_ts_imports(spark, corpus):
    js = {
        r["imported"]
        for r in extract_imports(corpus).where(F.col("lang") == "javascript").collect()
    }
    assert js == {"react", "./side-effect.css", "lodash"}
    ts = {
        r["imported"]
        for r in extract_imports(corpus).where(F.col("lang") == "typescript").collect()
    }
    assert ts == js


def test_unknown_lang_yields_nothing(spark, corpus):
    assert extract_imports(corpus).where(F.col("lang") == "markdown").count() == 0
    assert extract_defs(corpus).where(F.col("lang") == "markdown").count() == 0


def test_python_defs(spark, corpus):
    got = {
        (r["kind"], r["symbol"])
        for r in extract_defs(corpus).where(F.col("lang") == "python").collect()
    }
    # `method` is indented → not top-level
    assert got == {
        ("function", "top"),
        ("function", "atop"),
        ("class", "Widget"),
    }


def test_rust_defs(spark, corpus):
    got = {
        (r["kind"], r["symbol"])
        for r in extract_defs(corpus).where(F.col("lang") == "rust").collect()
    }
    assert got == {
        ("function", "parse"),
        ("function", "internal"),
        ("function", "io_task"),
        ("function", "danger"),
        ("struct", "Ast"),
        ("enum", "Node"),
        ("trait", "Visit"),
    }


def test_go_defs_skip_method_receiver(spark, corpus):
    got = {
        (r["kind"], r["symbol"])
        for r in extract_defs(corpus).where(F.col("lang") == "go").collect()
    }
    assert ("function", "Handler") in got
    assert ("function", "Serve") in got  # method receiver form still yields the name
    assert ("type", "Server") in got


def test_js_defs(spark, corpus):
    got = {
        (r["kind"], r["symbol"])
        for r in extract_defs(corpus).where(F.col("lang") == "javascript").collect()
    }
    assert got == {
        ("function", "App"),
        ("function", "helper"),
        ("class", "Store"),
    }


def test_module_stem(spark):
    df = spark.range(1).select(
        module_stem(F.lit("src/a/mod_7.py")).alias("a"),
        module_stem(F.lit("parser.rs")).alias("b"),
        module_stem(F.lit("no_extension")).alias("c"),
    )
    r = df.collect()[0]
    assert r["a"] == "mod_7" and r["b"] == "parser" and r["c"] == ""


def test_dependency_edges_semantics(spark):
    files = _files(
        spark,
        [
            # a.py imports b and dangling_x; b.py imports a (cycle ok) and b (self)
            ("r1", "src/a.py", "python", "import b\nimport dangling_x\n"),
            ("r1", "src/b.py", "python", "import a\nimport b\n"),
            # second provider of module `a` in another repo → fan-in of 2
            ("r2", "lib/a.py", "python", ""),
        ],
    )
    edges = dependency_edges(files)
    got = {
        (r["src_path"], r["dst_repo"], r["dst_path"]) for r in edges.collect()
    }
    # dangling_x resolves nowhere; b.py's self-import is dropped;
    # `import a` resolves to BOTH providers (r1 and r2)
    assert got == {
        ("src/a.py", "r1", "src/b.py"),
        ("src/b.py", "r1", "src/a.py"),
        ("src/b.py", "r2", "lib/a.py"),
    }
    # max_fanin=1 keeps the deterministic first provider (repo asc)
    capped = dependency_edges(files, max_fanin=1)
    got1 = {
        (r["src_path"], r["dst_repo"], r["dst_path"]) for r in capped.collect()
    }
    assert got1 == {
        ("src/a.py", "r1", "src/b.py"),
        ("src/b.py", "r1", "src/a.py"),
    }


def test_repo_rollup(spark):
    files = _files(
        spark,
        [
            ("r1", "src/a.py", "python", "import c\nimport d\n"),
            ("r1", "src/b.py", "python", "import c\n"),
            ("r2", "lib/c.py", "python", ""),
            ("r2", "lib/d.py", "python", ""),
        ],
    )
    roll = repo_rollup(dependency_edges(files)).collect()
    assert len(roll) == 1
    r = roll[0]
    assert (r["src_repo"], r["dst_repo"]) == ("r1", "r2")
    assert r["n_edges"] == 3 and r["n_src_files"] == 2 and r["n_modules"] == 2


def test_code_triples_shape(spark, corpus):
    t = code_triples(corpus)
    assert t.columns == ["subj", "pred", "obj"]
    preds = {r["pred"] for r in t.select("pred").distinct().collect()}
    assert preds <= {"IMPORTS", "DEFINES", "DEPENDS_ON", "CALLS"}
    assert {"IMPORTS", "DEFINES"} <= preds
    # DEFINES objects are kind:symbol
    d = t.where(F.col("pred") == "DEFINES").select("obj").collect()
    assert all(":" in r["obj"] for r in d)


def test_extraction_is_udf_free(spark, corpus):
    plan = extract_imports(corpus)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    plan2 = extract_defs(corpus)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan2 and "ArrowEvalPython" not in plan2


# ---------------------------------------------------------- call graph --

CALL_A = """\
def alpha(x):
    return beta(util_fn(x))

class Tool:
    pass
"""

CALL_B = """\
def beta(y):
    if y:
        return alpha(y)
    return beta(y - 1)
"""

CALL_C = """\
def gamma(z):
    t = Tool()
    while z:
        z -= 1
    return t
"""

CALL_RS = """\
pub fn run(x: u64) -> u64 {
    match compute(x) {
        v => helper_call(v),
    }
}
pub fn compute(x: u64) -> u64 { x }
"""


@pytest.fixture(scope="module")
def call_corpus(spark):
    return _files(
        spark,
        [
            ("r1", "src/a.py", "python", CALL_A),
            ("r1", "src/b.py", "python", CALL_B),
            ("r1", "src/c.py", "python", CALL_C),
            ("r2", "src/b2.py", "python", "def beta(q):\n    return q\n"),
            ("r2", "src/runner.rs", "rust", CALL_RS),
        ],
    )


def test_extract_calls_filters_keywords_and_own_defs(spark, call_corpus):
    from graphrag_rs_spark.operators.code_graph import extract_calls

    got = {
        (r["path"], r["called"]) for r in extract_calls(call_corpus).collect()
    }
    # a.py: alpha is its own def (subtracted); beta + util_fn survive
    assert {("src/a.py", "beta"), ("src/a.py", "util_fn")} <= got
    # b.py: recursive beta subtracted with its own def; alpha survives
    assert ("src/b.py", "alpha") in got
    assert ("src/b.py", "beta") not in got
    # c.py: `while z:` has no paren; Tool( survives; gamma is own def
    assert ("src/c.py", "Tool") in got
    assert ("src/c.py", "while") not in got and ("src/c.py", "gamma") not in got
    # rust: `match compute(x)` — match is a keyword, compute is an
    # intra-file call to its own def (subtracted); helper_call survives
    assert ("src/runner.rs", "helper_call") in got
    assert ("src/runner.rs", "match") not in got
    assert ("src/runner.rs", "compute") not in got


def test_call_edges_resolve_same_repo_functions_only(spark, call_corpus):
    from graphrag_rs_spark.operators.code_graph import call_edges

    got = {
        (r["repo"], r["src_path"], r["dst_path"], r["symbol"])
        for r in call_edges(call_corpus).collect()
    }
    # a.py→beta resolves to b.py (same repo), NOT to r2's b2.py
    # b.py→alpha resolves to a.py; util_fn/helper_call dangle;
    # c.py→Tool does NOT resolve (Tool is a class, providers are functions)
    assert got == {
        ("r1", "src/a.py", "src/b.py", "beta"),
        ("r1", "src/b.py", "src/a.py", "alpha"),
    }


def test_call_edges_max_fanout(spark):
    from graphrag_rs_spark.operators.code_graph import call_edges

    files = _files(
        spark,
        [("r", f"src/p{i}.py", "python", "def common(x):\n    return x\n")
         for i in range(4)]
        + [("r", "src/caller.py", "python", "def go():\n    return common(1)\n")],
    )
    full = call_edges(files).where(F.col("src_path") == "src/caller.py")
    assert full.count() == 4
    capped = call_edges(files, max_fanout=2).where(
        F.col("src_path") == "src/caller.py"
    )
    # deterministic: first two providers ordered by dst_path
    assert sorted(r["dst_path"] for r in capped.collect()) == [
        "src/p0.py", "src/p1.py",
    ]


def test_extract_calls_is_udf_free(spark, call_corpus):
    from graphrag_rs_spark.operators.code_graph import extract_calls

    plan = extract_calls(call_corpus)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_external_api_usage(spark):
    from graphrag_rs_spark.operators.code_graph import external_api_usage

    files = _files(
        spark,
        [
            ("r1", "src/app.py", "python", "import requests\nimport util\n"),
            ("r2", "src/cli.py", "python", "import requests\nimport numpy\n"),
            ("r1", "src/util.py", "python", "import os\n"),
        ],
    )
    got = {
        r["module"]: (r["n_files"], r["n_repos"])
        for r in external_api_usage(files).collect()
    }
    # util resolves in-corpus and is absent; requests counted across repos
    assert got == {"requests": (2, 2), "numpy": (1, 1), "os": (1, 1)}


def test_test_link_edges(spark):
    from graphrag_rs_spark.operators.code_graph import test_link_edges

    files = _files(
        spark,
        [
            ("r1", "src/parser.py", "python", ""),
            ("r1", "tests/test_parser.py", "python", ""),
            ("r1", "lexer_test.go", "go", ""),          # suffix convention
            ("r1", "src/lexer.go", "go", ""),
            ("r2", "tests/test_parser.py", "python", ""),  # no parser in r2 → dangles
            ("r1", "tests/test_missing.py", "python", ""),
        ],
    )
    got = {
        (r["test_path"], r["src_path"]) for r in test_link_edges(files).collect()
    }
    assert got == {
        ("tests/test_parser.py", "src/parser.py"),
        ("lexer_test.go", "src/lexer.go"),
    }
    assert test_link_edges(files).columns == [
        "repo", "test_path", "pred", "src_path", "module"
    ]


def test_identifier_subtokens(spark):
    from graphrag_rs_spark.operators.code_graph import identifier_subtokens

    defs = spark.createDataFrame(
        [
            ("r", "a.py", "python", "function", "getHTTPServer"),
            ("r", "a.py", "python", "function", "parse_json"),
            ("r", "b.py", "python", "class", "_PrivateThing"),
            ("r", "b.py", "python", "function", "parse_json2"),
        ],
        ["repo", "path", "lang", "kind", "symbol"],
    )
    got = {
        r["subtoken"]: (r["n_defs"], r["n_files"])
        for r in identifier_subtokens(defs).collect()
    }
    # camel + abbreviation boundaries: getHTTPServer -> get/http/server;
    # leading underscore yields no empty token; digits stay attached
    assert got == {
        "get": (1, 1), "http": (1, 1), "server": (1, 1),
        "parse": (2, 2), "json": (1, 1), "json2": (1, 1),
        "private": (1, 1), "thing": (1, 1),
    }


def test_unused_imports(spark):
    from graphrag_rs_spark.operators.code_graph import unused_imports

    py = (
        "import os\n"
        "import json\n"
        "from collections import deque\n"
        "# os mentioned in a comment does not count\n"
        "def f(x):\n"
        "    return os.path.join(x)\n"  # os used, json/collections not
    )
    rs = (
        "use crate::parser;\n"
        "use crate::lexer::tok;\n"
        "fn main() { parser::run(); }\n"  # parser used, lexer not
    )
    js = (
        "import util from './lib/util';\n"
        "import dead from './lib/dead';\n"
        "const x = util.go();\n"  # trailing-segment binding name
    )
    files = spark.createDataFrame(
        [
            ("r", "a.py", "python", py),
            ("r", "b.rs", "rust", rs),
            ("r", "c.js", "javascript", js),
        ],
        "repo string, path string, lang string, content string",
    )
    rows = {(r["path"], r["imported"]) for r in unused_imports(files).collect()}
    assert rows == {
        ("a.py", "json"),
        ("a.py", "collections"),
        ("b.rs", "lexer"),
        ("c.js", "./lib/dead"),
    }


def test_stale_tests(spark):
    from graphrag_rs_spark.operators.code_graph import stale_tests

    files = spark.createDataFrame(
        [
            ("r", "src/mod_1.py", "python", "def f(): pass\n"),
            ("r", "src/mod_2.py", "python", "def g(): pass\n"),
            ("r", "tests/test_mod_1.py", "python", "import mod_1\n"),
            ("r", "tests/test_mod_2.py", "python", "import mod_2\n"),
        ],
        "repo string, path string, lang string, content string",
    )
    removed = spark.createDataFrame(
        [("r", "src/mod_1.py")], "repo string, src_path string"
    )
    rows = [tuple(r) for r in stale_tests(files, removed).collect()]
    assert rows == [
        ("r", "tests/test_mod_1.py", "src/mod_1.py", "target_removed")
    ]
