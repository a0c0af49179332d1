"""Alternative parse methods: python-native flattening, the instrumented
TeX capture method driven by a fake pdflatex runner, plasTeX gating."""

from pathlib import Path

import pytest

from theoremsearch_tpu.ingest.methods.flatten import inline_inputs, parse_by_flatten
from theoremsearch_tpu.ingest.methods.tex_capture import (
    BEGIN_MARK,
    END_MARK,
    SECTION_MARK,
    generate_capture_package,
    inject_package,
    parse_by_tex,
    parse_capture_log,
    run_pdflatex_with_stubs,
)


def test_inline_inputs_recursive(tmp_path):
    (tmp_path / "macros.tex").write_text("\\newtheorem{theorem}{Theorem}[section]\n")
    (tmp_path / "body.tex").write_text("\\begin{theorem} inlined result \\end{theorem}\n")
    (tmp_path / "main.tex").write_text(
        "\\documentclass{article}\\input{macros}\n"
        "\\begin{document}\\section{A}\\input{body.tex}\\end{document}"
    )
    flat = inline_inputs(tmp_path / "main.tex")
    assert "newtheorem" in flat and "inlined result" in flat
    thms = parse_by_flatten(tmp_path / "main.tex")
    assert [t.name for t in thms] == ["Theorem 1.1."]


def test_inline_inputs_cycle_safe(tmp_path):
    (tmp_path / "a.tex").write_text("A \\input{b}")
    (tmp_path / "b.tex").write_text("B \\input{a}")
    flat = inline_inputs(tmp_path / "a.tex")
    assert flat.count("A") == 1 and flat.count("B") == 1


def test_capture_package_and_injection():
    sty = generate_capture_package(["theorem", "lemma"])
    assert "\\RenewEnviron{theorem}" in sty and "\\RenewEnviron{lemma}" in sty
    assert "thmcapout" in sty
    doc = "\\documentclass{article}\n\\begin{document}x\\end{document}"
    patched = inject_package(doc)
    assert patched.index("usepackage{thmcapture}") < patched.index("\\begin{document}")


def test_parse_capture_log_numbering():
    decls = "\\newtheorem{theorem}{Theorem}[section]\\newtheorem{lemma}[theorem]{Lemma}"
    log = "\n".join([
        f"{SECTION_MARK}|section",
        f"{BEGIN_MARK}|theorem|",
        "Body one \\label{t1}",
        END_MARK,
        f"{BEGIN_MARK}|lemma|Helper",
        "Body two",
        END_MARK,
        f"{SECTION_MARK}|appendix",
        f"{SECTION_MARK}|section",
        f"{BEGIN_MARK}|theorem|",
        "Appendix body",
        END_MARK,
    ])
    thms = parse_capture_log(log, decls)
    assert [t.name for t in thms] == ["Theorem 1.1.", "Lemma 1.2. (Helper)", "Theorem A.1."]
    assert thms[0].label == "t1" and "\\label" not in thms[0].body


class FakeTeX:
    """Fake pdflatex: fails on a missing package until it is stubbed, then
    'compiles' by writing the capture log for the injected document."""

    def __init__(self, missing=("fancypkg.sty",)):
        self.missing = list(missing)
        self.calls = 0

    def __call__(self, cmd, cwd):
        self.calls += 1
        cwd = Path(cwd)

        class R:
            stdout = ""
            stderr = ""
            returncode = 0

        r = R()
        for m in self.missing:
            if not (cwd / m).exists():
                r.stdout = f"! LaTeX Error: File `{m}' not found"
                r.returncode = 1
                return r
        # "compile": emit a capture log for the patched main file
        mains = list(cwd.glob("__thmcap_*.tex"))
        cap = cwd / (mains[0].stem + ".thmcap")
        cap.write_text(
            "\n".join([
                f"{SECTION_MARK}|section",
                f"{BEGIN_MARK}|theorem|",
                "Captured by fake TeX $x>0$",
                END_MARK,
            ])
        )
        return r


def test_run_pdflatex_stub_loop(tmp_path):
    main = tmp_path / "__thmcap_main.tex"
    main.write_text("\\documentclass{article}\\usepackage{fancypkg}\\begin{document}\\end{document}")
    fake = FakeTeX()
    assert run_pdflatex_with_stubs(main, runner=fake)
    assert (tmp_path / "fancypkg.sty").exists()
    assert fake.calls == 2  # fail -> stub -> succeed


def test_parse_by_tex_with_fake_runner(tmp_path):
    (tmp_path / "main.tex").write_text(
        "\\documentclass{article}\\usepackage{fancypkg}\n"
        "\\newtheorem{theorem}{Theorem}[section]\n"
        "\\begin{document}\\section{A}\\begin{theorem} x \\end{theorem}\\end{document}"
    )
    thms = parse_by_tex(tmp_path, runner=FakeTeX())
    assert [t.name for t in thms] == ["Theorem 1.1."]
    assert "Captured by fake TeX" in thms[0].body


def test_parse_by_tex_gated_without_binary(tmp_path, monkeypatch):
    import shutil as _shutil

    monkeypatch.setattr(_shutil, "which", lambda name: None)
    (tmp_path / "main.tex").write_text("\\documentclass{article}\\begin{document}\\end{document}")
    with pytest.raises(RuntimeError, match="pdflatex not available"):
        parse_by_tex(tmp_path)


def test_plastex_gated():
    from theoremsearch_tpu.ingest.methods.plastex_method import PlasTexUnavailable, parse_by_plastex

    try:
        import plasTeX  # noqa: F401

        pytest.skip("plasTeX installed; gating test not applicable")
    except ImportError:
        pass
    with pytest.raises(PlasTexUnavailable):
        parse_by_plastex("/nonexistent")


def test_plastex_node_collection_is_document_order():
    """Interleaved envs sharing a counter must number in source order,
    not env-grouped order (the env-by-env getElementsByTagName walk)."""
    from theoremsearch_tpu.ingest.methods.plastex_method import (
        collect_env_nodes_in_order,
    )

    class N:
        def __init__(self, name, children=()):
            self.nodeName = name
            self.childNodes = list(children)

    doc = N("document", [
        N("section", [N("theorem"), N("lemma"), N("par", [N("theorem")])]),
        N("lemma"),
    ])
    got = [name for name, _ in collect_env_nodes_in_order(doc, ["theorem", "lemma"])]
    assert got == ["theorem", "lemma", "theorem", "lemma"]
