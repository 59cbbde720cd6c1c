"""Frontend tests: tokenizer, parser, compiler, witness, legacy format.

Mirrors the reference suites at ast.rs:377-707, circuit/mod.rs:658-770 and
the DummyRep legacy parser (dummy_rep.rs:55-142).
"""

import pytest

from zksnark_tpu.field.host import Z251
from zksnark_tpu.frontend import ast, compiler, legacy, witness
from zksnark_tpu.frontend.ast import StructureErr, SyntaxErr
from zksnark_tpu.frontend.r1cs import R1CS

QUAD_CODE = """(in x a b c)
(out y)
(verify x y)

(program
    (= t1
        (* x a))
    (= t2
        (* x (+ t1 b)))
    (= y
        (* 1 (+ t2 c))))"""

SIMPLE_CODE = open("test_programs/simple.zk").read()


# ---------------------------------------------------------------------------
# Tokenizer (mirrors ast.rs:394-522)
# ---------------------------------------------------------------------------

def tok(s):
    return ast.parse_token(s, Z251)


def test_parse_token_valid():
    assert tok("(in") == [("open",), ("kw", "in")]
    assert tok("(out") == [("open",), ("kw", "out")]
    assert tok("(verify") == [("open",), ("kw", "verify")]
    assert tok("(program") == [("open",), ("kw", "program")]
    assert tok("(=") == [("open",), ("kw", "=")]
    assert tok("(*") == [("open",), ("kw", "*")]
    assert tok("(+") == [("open",), ("kw", "+")]
    assert tok("x") == [("var", "x")]
    assert tok("y)") == [("var", "y"), ("close",)]
    assert tok("y))") == [("var", "y"), ("close",), ("close",)]
    assert tok("9") == [("lit", 9)]
    assert tok("9)") == [("lit", 9), ("close",)]


@pytest.mark.parametrize("substr,msg", [
    ("(", "found whitespace after '('"),
    ("(vari(able", "unexpected '('"),
    ("vari(able", "unexpected '('"),
    ("(variable)", "unexpected ')'"),
    ("vari=able", "unexpected operator"),
    ("vari*able", "unexpected operator"),
    ("vari+able", "unexpected operator"),
    ("(vari=able", "unexpected operator"),
    ("(vari*able", "unexpected operator"),
    ("(vari+able", "unexpected operator"),
    ("9variable", "could not parse literal"),
    ("variabl)e))", "expected ')'"),
])
def test_parse_token_invalid(substr, msg):
    with pytest.raises(ValueError, match=msg.replace("(", r"\(").replace(")", r"\)")):
        tok(substr)


def test_z251_literal_out_of_range_rejected():
    # Z251's FromStr rejects literals >= 251 (z251.rs:78-83)
    with pytest.raises(ValueError, match="could not parse literal"):
        tok("252")


def test_tokenlist_golden():
    # mirrors ast.rs:524-604
    tokens = ast.try_to_list(QUAD_CODE, Z251)
    expected = (
        [("open",), ("kw", "in"), ("var", "x"), ("var", "a"), ("var", "b"),
         ("var", "c"), ("close",),
         ("open",), ("kw", "out"), ("var", "y"), ("close",),
         ("open",), ("kw", "verify"), ("var", "x"), ("var", "y"), ("close",),
         ("open",), ("kw", "program"),
         ("open",), ("kw", "="), ("var", "t1"),
         ("open",), ("kw", "*"), ("var", "x"), ("var", "a"), ("close",),
         ("close",),
         ("open",), ("kw", "="), ("var", "t2"),
         ("open",), ("kw", "*"), ("var", "x"),
         ("open",), ("kw", "+"), ("var", "t1"), ("var", "b"), ("close",),
         ("close",), ("close",),
         ("open",), ("kw", "="), ("var", "y"),
         ("open",), ("kw", "*"), ("lit", 1),
         ("open",), ("kw", "+"), ("var", "t2"), ("var", "c"), ("close",),
         ("close",), ("close",), ("close",)]
    )
    assert tokens == expected


def test_syntax_error_carries_line():
    with pytest.raises(SyntaxErr) as e:
        ast.try_to_list("(in x)\n(out vari(able)", Z251)
    assert e.value.line == 2


def test_next_group():
    # mirrors ast.rs:606-621
    t = ast.try_to_list("(in x y)", Z251)
    inner = ast.try_to_list("in x y", Z251)
    assert ast.next_group(iter(t)) == inner

    t = iter(ast.try_to_list("y (* 1 (+ t2 c)))", Z251))
    assert ast.next_group(t) == [("var", "y")]
    assert ast.next_group(t) == ast.try_to_list("* 1 (+ t2 c)", Z251)


def test_parse_expression_golden():
    # mirrors ast.rs:623-683
    exprs = ast.expressions(QUAD_CODE, Z251)
    assert exprs[0] == ("in", [("var", "x"), ("var", "a"), ("var", "b"),
                               ("var", "c")])
    assert exprs[1] == ("out", [("var", "y")])
    assert exprs[2] == ("verify", [("var", "x"), ("var", "y")])
    assert exprs[3] == ("program", [
        ("assign", ("var", "t1"), ("mul", ("var", "x"), ("var", "a"))),
        ("assign", ("var", "t2"),
         ("mul", ("var", "x"), ("add", [("var", "t1"), ("var", "b")]))),
        ("assign", ("var", "y"),
         ("mul", ("lit", 1), ("add", [("var", "t2"), ("var", "c")]))),
    ])


def test_variable_order():
    # mirrors ast.rs:685-706
    tokens = ast.try_to_list(QUAD_CODE, Z251)
    assert ast.variable_order(tokens) == ["x", "y", "t1", "a", "t2", "b", "c"]


# ---------------------------------------------------------------------------
# Compiler (mirrors circuit/mod.rs:664-718)
# ---------------------------------------------------------------------------

def test_compile_golden_dummy_rep():
    actual = compiler.parse(QUAD_CODE, Z251)
    expected = R1CS(
        u=[[(3, 1)], [(1, 1), (2, 1)], [], [], [], [], [], []],
        v=[[], [], [], [(2, 1)], [(1, 1)], [(3, 1)], [(2, 1)], [(3, 1)]],
        w=[[], [], [(3, 1)], [(1, 1)], [], [(2, 1)], [], []],
        roots=[1, 2, 3],
        input=2,
    )
    assert actual == expected


def test_compile_shape_errors():
    prog = "(program (= y (* x x)))"
    with pytest.raises(StructureErr, match="exactly one each"):
        compiler.parse("(in x)\n(out y)\n(verify x y)", Z251)
    with pytest.raises(StructureErr, match="first expression to be 'in'"):
        compiler.parse(f"(out y)\n(in x)\n(verify x)\n{prog}", Z251)
    with pytest.raises(StructureErr, match="second expression to be 'out'"):
        compiler.parse(f"(in x)\n(in x)\n(verify x)\n{prog}", Z251)
    with pytest.raises(StructureErr, match="third expression to be 'verify'"):
        compiler.parse(f"(in x)\n(out y)\n(out y)\n{prog}", Z251)
    with pytest.raises(StructureErr, match="fourth expression to be 'program'"):
        compiler.parse("(in x)\n(out y)\n(verify x)\n(verify x)", Z251)


def test_compile_output_wire_errors():
    # Reassigning a non-verify variable as a gate output is an error
    code = """(in x)
(out y)
(verify y)

(program
    (= t (* x x))
    (= t (* x x))
    (= y (* t t)))"""
    with pytest.raises(StructureErr, match="Already declared variable"):
        compiler.parse(code, Z251)

    # A verify variable can be a gate output only once
    code = """(in x)
(out y)
(verify y)

(program
    (= y (* x x))
    (= y (* x x)))"""
    with pytest.raises(StructureErr, match="cannot be the output of two"):
        compiler.parse(code, Z251)


def test_compile_add_mul_shape_errors():
    code = """(in x)
(out y)
(verify y)

(program
    (= y (* x (+ (* x 4)))))"""
    with pytest.raises(StructureErr, match="must be a literal"):
        compiler.parse(code, Z251)

    code = """(in x)
(out y)
(verify y)

(program
    (= y (* x (+ (* 4 5)))))"""
    with pytest.raises(StructureErr, match="must be a variable"):
        compiler.parse(code, Z251)


# ---------------------------------------------------------------------------
# Witness interpreter (mirrors circuit/mod.rs:720-769)
# ---------------------------------------------------------------------------

def test_evaluate():
    assignments = {"a": 3, "b": 2}
    temp = ("mul", ("var", "a"), ("var", "b"))
    scale_temp = ("mul", ("lit", 4), temp)
    six = ("mul", ("lit", 6), ("lit", 1))
    s = ("add", [scale_temp, ("var", "c"), six])
    expression = ("mul", ("lit", 1), s)

    assert witness.evaluate(expression, assignments, Z251) is None
    assignments["c"] = 4
    assert witness.evaluate(expression, assignments, Z251) == 34


def test_weights_golden():
    w = witness.weights(SIMPLE_CODE, [3, 2, 4], Z251)
    assert w == [1, 2, 34, 6, 3, 4]


def test_weights_errors():
    with pytest.raises(StructureErr, match="Wrong number of values"):
        witness.weights(SIMPLE_CODE, [3, 2], Z251)

    code = """(in x)
(out y)
(verify y)

(program
    (= x (* x x)))"""
    with pytest.raises(StructureErr, match="already assigned"):
        witness.weights(code, [3], Z251)

    code = """(in x)
(out y)
(verify y)

(program
    (= y (* x z)))"""
    with pytest.raises(StructureErr, match="Under constrained"):
        witness.weights(code, [3], Z251)


# ---------------------------------------------------------------------------
# Legacy line format (mirrors dummy_rep.rs:55-142)
# ---------------------------------------------------------------------------

def test_legacy_quad_share():
    code = open("test_programs/quad_share.zk").read()
    r = legacy.parse(code, Z251)
    assert r.input == 2
    assert r.roots == [1, 2, 3]
    assert r.num_wires == 8
    # gate 1: t1 = x * a ; vars = [x, y, a, b, c, t1, t2] (1-based after unity)
    assert r.u[1] == [(1, 1), (2, 1)]      # x on left of gates 1, 2
    assert r.u[0] == [(3, 1)]              # literal 1 on left of gate 3
    assert r.w[6] == [(1, 1)]              # t1 output of gate 1
    assert r.v[3] == [(1, 1)]              # a on right of gate 1
    assert r.w[2] == [(3, 1)]              # y output of gate 3


def test_legacy_matches_hand_matrix():
    """The legacy quad_share parse must interpolate to the exact hand-written
    coefficient matrices in the reference test (groth16/mod.rs:474-521)."""
    from zksnark_tpu.groth16.qap import from_r1cs

    code = open("test_programs/quad_share.zk").read()
    qap = from_r1cs(Z251, legacy.parse(code, Z251))

    expect_u = [[1, 124, 126], [0, 127, 125], [0, 0, 0], [0, 0, 0],
                [0, 0, 0], [0, 0, 0], [0, 0, 0], [0, 0, 0]]
    expect_v = [[0, 0, 0], [0, 0, 0], [0, 0, 0], [3, 123, 126],
                [248, 4, 250], [1, 124, 126], [248, 4, 250], [1, 124, 126]]
    expect_w = [[0, 0, 0], [0, 0, 0], [1, 124, 126], [0, 0, 0],
                [0, 0, 0], [0, 0, 0], [3, 123, 126], [248, 4, 250]]

    def norm(rows):
        return [row + [0] * (3 - len(row)) for row in rows]

    assert norm(qap.u) == expect_u
    assert norm(qap.v) == expect_v
    assert norm(qap.w) == expect_w
    assert qap.t == [245, 11, 245, 1]
    assert qap.input == 2 and qap.degree == 3
