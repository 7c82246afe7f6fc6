"""C4 per-language goldens + the tree-sitter plug-point seam.

The container has no tree-sitter, so the regex item-splitter stands in
(reference RustCodeChunkingStrategy, chunking_strategies.rs:145-255
chunks at top-level item boundaries). These goldens pin each language's
boundary set; the plug-point test proves a parser-backed splitter drops
in with NO operator changes."""

from __future__ import annotations

from graphrag_rs_spark.operators.code_chunking import (
    register_splitter,
    split_code,
)


def _starts(chunks):
    return [c[1].splitlines()[0] for c in chunks]


def _roundtrip(src, chunks):
    for _i, content, s, e in chunks:
        assert src[s:e] == content
    assert "".join(c[1] for c in chunks) == src


def test_go_items():
    src = (
        "package main\n\n"
        'import "fmt"\n\n'
        "type Point struct {\n\tX int\n\tY int\n}\n\n"
        "func (p Point) Norm() int {\n\treturn p.X*p.X + p.Y*p.Y\n}\n\n"
        "func main() {\n\tfmt.Println(Point{1, 2}.Norm())\n}\n"
    )
    chunks = split_code(src, "go", min_chunk_size=20)
    assert _starts(chunks) == ["package main", "type Point struct {", "func (p Point) Norm() int {", "func main() {"]
    _roundtrip(src, chunks)


def test_javascript_items():
    src = (
        "const limit = 10;\n\n"
        "export async function fetchAll(url) {\n  return fetch(url);\n}\n\n"
        "class Store {\n  constructor() {\n    this.items = [];\n  }\n}\n\n"
        "export default Store;\n"
    )
    chunks = split_code(src, "javascript", min_chunk_size=10)
    assert _starts(chunks) == [
        "const limit = 10;",
        "export async function fetchAll(url) {",
        "class Store {",
    ]
    _roundtrip(src, chunks)


def test_typescript_items():
    src = (
        "interface Shape {\n  area(): number;\n}\n\n"
        "type Pair = [number, number];\n\n"
        "export class Circle implements Shape {\n  constructor(private r: number) {}\n  area() { return 3.14 * this.r * this.r; }\n}\n\n"
        "enum Color { Red, Green }\n"
    )
    chunks = split_code(src, "typescript", min_chunk_size=20)
    assert _starts(chunks) == [
        "interface Shape {",
        "type Pair = [number, number];",
        "export class Circle implements Shape {",
        "enum Color { Red, Green }",
    ]
    _roundtrip(src, chunks)


def test_java_items():
    src = (
        "package com.example;\n\n"
        "public class Greeter {\n    public String greet() {\n        return \"hi\";\n    }\n}\n\n"
        "interface Greetable {\n    String greet();\n}\n\n"
        "public record PointRec(int x, int y) {}\n"
    )
    chunks = split_code(src, "java", min_chunk_size=20)
    assert _starts(chunks) == [
        "package com.example;",
        "public class Greeter {",
        "interface Greetable {",
        "public record PointRec(int x, int y) {}",
    ]
    _roundtrip(src, chunks)


def test_c_items():
    src = (
        "#include <stdio.h>\n\n"
        "struct point {\n    int x;\n    int y;\n};\n\n"
        "static int norm(struct point p)\n{\n    return p.x * p.x + p.y * p.y;\n}\n\n"
        "int main(void)\n{\n    struct point p = {1, 2};\n    printf(\"%d\", norm(p));\n    return 0;\n}\n"
    )
    chunks = split_code(src, "c", min_chunk_size=20)
    assert _starts(chunks) == [
        "#include <stdio.h>",
        "struct point {",
        "static int norm(struct point p)",
        "int main(void)",
    ]
    _roundtrip(src, chunks)


def test_c_prototypes_are_not_boundaries():
    # a prototype (ends with ';') must not split; the definition must
    src = (
        "int helper(int x);\n"
        "int helper(int x)\n{\n    return x + 1;\n}\n"
    )
    chunks = split_code(src, "c", min_chunk_size=10)
    assert len(chunks) == 2
    assert chunks[1][1].startswith("int helper(int x)\n{")


def test_python_decorator_attaches():
    src = (
        "import os\nimport sys\n\n"
        "@decorated\n"
        "def alpha():\n    return os.sep\n\n"
        "class Beta:\n    def m(self):\n        return 1\n"
    )
    # the 11-char decorator fragment is below min_chunk_size=20, so it
    # merges FORWARD into the def it decorates
    chunks = split_code(src, "python", min_chunk_size=20)
    assert _starts(chunks) == ["import os", "@decorated", "class Beta:"]
    _roundtrip(src, chunks)


def test_tree_sitter_plug_point(spark):
    """A parser-backed splitter registered for a language takes over with
    no operator changes: the mapInPandas dispatch routes through the
    registry."""
    from graphrag_rs_spark.operators.code_chunking import chunk_code_documents

    def fake_tree_sitter(text, min_chunk_size):
        # stand-in for a tree-sitter AST walk: one chunk per line pair
        lines = text.splitlines(keepends=True)
        out, pos = [], 0
        for i in range(0, len(lines), 2):
            piece = "".join(lines[i : i + 2])
            out.append((len(out), piece, pos, pos + len(piece)))
            pos += len(piece)
        return out

    register_splitter("zig", fake_tree_sitter)
    try:
        assert split_code("a\nb\nc\nd\n", "zig", 1) == [
            (0, "a\nb\n", 0, 4),
            (1, "c\nd\n", 4, 8),
        ]
        df = spark.createDataFrame(
            [("d1", "zig", "a\nb\nc\nd\n")], ["doc_id", "lang", "content"]
        )
        rows = chunk_code_documents(df).orderBy("chunk_id").collect()
        assert [r["content"] for r in rows] == ["a\nb\n", "c\nd\n"]
    finally:
        register_splitter("zig", None)
