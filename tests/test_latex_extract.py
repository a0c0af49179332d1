"""LaTeX theorem extraction golden tests — the parser-goldens layer
SURVEY.md §4 calls for. Each case checks rendered names (amsthm
numbering), bodies, and labels."""

import pytest

from theoremsearch_tpu.ingest.latex.extract import extract_theorems
from theoremsearch_tpu.ingest.latex.macros import collect_macros, expand_macros
from theoremsearch_tpu.ingest.latex.numbering import CounterTree, to_alpha
from theoremsearch_tpu.ingest.latex.scanner import find_env_spans, read_group, strip_comments


DOC = r"""
\documentclass{article}
\newtheorem{theorem}{Theorem}[section]
\newtheorem{lemma}[theorem]{Lemma}
\newtheorem*{remark}{Remark}
\begin{document}
\section{Intro}
\begin{theorem}\label{thm:main} Every even number $n > 2$ is interesting. \end{theorem}
\begin{lemma} A helpful fact. \end{lemma}
\section{More}
\begin{theorem}[Main] The main result. \end{theorem}
\begin{remark} No number here. \end{remark}
\end{document}
"""


def test_basic_numbering_and_labels():
    thms = extract_theorems(DOC)
    names = [t.name for t in thms]
    assert names == ["Theorem 1.1.", "Lemma 1.2.", "Theorem 2.1. (Main)", "Remark"]
    assert thms[0].label == "thm:main"
    assert "\\label" not in thms[0].body
    assert "interesting" in thms[0].body
    assert thms[1].label is None


def test_shared_counter_semantics():
    # lemma shares theorem's counter: Thm 1.1, Lem 1.2, Thm 1.3
    doc = r"""
\newtheorem{theorem}{Theorem}[section]
\newtheorem{lemma}[theorem]{Lemma}
\begin{document}
\section{A}
\begin{theorem} t1 \end{theorem}
\begin{lemma} l1 \end{lemma}
\begin{theorem} t2 \end{theorem}
\end{document}"""
    names = [t.name for t in extract_theorems(doc)]
    assert names == ["Theorem 1.1.", "Lemma 1.2.", "Theorem 1.3."]


def test_section_resets_counter():
    doc = r"""
\newtheorem{theorem}{Theorem}[section]
\begin{document}
\section{A}\begin{theorem} a \end{theorem}
\section{B}\begin{theorem} b \end{theorem}\begin{theorem} c \end{theorem}
\end{document}"""
    names = [t.name for t in extract_theorems(doc)]
    assert names == ["Theorem 1.1.", "Theorem 2.1.", "Theorem 2.2."]


def test_unnumbered_global_counter():
    doc = r"""
\newtheorem{theorem}{Theorem}
\begin{document}
\begin{theorem} a \end{theorem}
\begin{theorem} b \end{theorem}
\end{document}"""
    names = [t.name for t in extract_theorems(doc)]
    assert names == ["Theorem 1.", "Theorem 2."]


def test_appendix_alpha_numbering():
    doc = r"""
\newtheorem{theorem}{Theorem}[section]
\begin{document}
\section{A}\begin{theorem} main \end{theorem}
\appendix
\section{App}\begin{theorem} appendix thm \end{theorem}
\end{document}"""
    names = [t.name for t in extract_theorems(doc)]
    assert names == ["Theorem 1.1.", "Theorem A.1."]


def test_default_envs_without_declarations():
    doc = r"""
\begin{document}
\begin{lemma} undeclared lemma \end{lemma}
\begin{corollary} undeclared corollary \end{corollary}
\end{document}"""
    thms = extract_theorems(doc)
    assert [t.name for t in thms] == ["Lemma 1.", "Corollary 1."]


def test_macro_expansion_in_body():
    doc = r"""
\newcommand{\R}{\mathbb{R}}
\newcommand{\norm}[1]{\|#1\|}
\newtheorem{theorem}{Theorem}
\begin{document}
\begin{theorem} For $x \in \R$, $\norm{x} \ge 0$. \end{theorem}
\end{document}"""
    t = extract_theorems(doc)[0]
    assert "\\mathbb{R}" in t.body
    assert "\\|x\\|" in t.body


def test_def_macro_and_mathoperator():
    doc = r"""
\def\eps{\varepsilon}
\DeclareMathOperator{\Spec}{Spec}
\newtheorem{theorem}{Theorem}
\begin{document}
\begin{theorem} $\Spec A$ and $\eps > 0$. \end{theorem}
\end{document}"""
    t = extract_theorems(doc)[0]
    assert "\\operatorname{Spec}" in t.body
    assert "\\varepsilon" in t.body


def test_newenvironment_alias():
    doc = r"""
\newtheorem{theorem}{Theorem}[section]
\newenvironment{mainthm}{\begin{theorem}}{\end{theorem}}
\begin{document}
\section{A}
\begin{mainthm} the big one \end{mainthm}
\end{document}"""
    thms = extract_theorems(doc)
    assert len(thms) == 1
    assert thms[0].name == "Theorem 1.1."


def test_newaliascnt_shared():
    doc = r"""
\newtheorem{theorem}{Theorem}
\newaliascnt{lemma}{theorem}
\newtheorem{lemma}[lemma]{Lemma}
\begin{document}
\begin{theorem} a \end{theorem}
\begin{lemma} b \end{lemma}
\end{document}"""
    names = [t.name for t in extract_theorems(doc)]
    assert names == ["Theorem 1.", "Lemma 2."]


def test_declaretheorem_keyval():
    doc = r"""
\declaretheorem[name=Satz, numberwithin=section]{satz}
\begin{document}
\section{A}
\begin{satz} ein satz \end{satz}
\end{document}"""
    t = extract_theorems(doc)[0]
    assert t.name == "Satz 1.1."


def test_spnewtheorem():
    doc = r"""
\spnewtheorem{mythm}{MyTheorem}{\bfseries}{\itshape}
\begin{document}
\begin{mythm} springer style \end{mythm}
\end{document}"""
    t = extract_theorems(doc)[0]
    assert t.name == "MyTheorem 1."


def test_duplicate_labels_deduped():
    doc = r"""
\newtheorem{theorem}{Theorem}
\begin{document}
\begin{theorem}\label{dup} a \end{theorem}
\begin{theorem}\label{dup} b \end{theorem}
\end{document}"""
    thms = extract_theorems(doc)
    assert thms[0].label == "dup"
    assert thms[1].label is None


def test_comments_stripped_but_escaped_percent_kept():
    doc = r"""
\newtheorem{theorem}{Theorem}
\begin{document}
% \begin{theorem} commented out \end{theorem}
\begin{theorem} at least 50\% of cases. % trailing comment
\end{theorem}
\end{document}"""
    thms = extract_theorems(doc)
    assert len(thms) == 1
    assert "50\\%" in thms[0].body
    assert "trailing" not in thms[0].body


def test_comment_environment_removed():
    doc = r"""
\newtheorem{theorem}{Theorem}
\begin{document}
\begin{comment}\begin{theorem} hidden \end{theorem}\end{comment}
\begin{theorem} visible \end{theorem}
\end{document}"""
    thms = extract_theorems(doc)
    assert len(thms) == 1 and "visible" in thms[0].body


def test_nested_env_spans():
    spans = list(find_env_spans(r"\begin{theorem} outer \begin{theorem} inner \end{theorem} rest \end{theorem}", "theorem"))
    assert len(spans) == 1
    assert "inner" in spans[0][2] and "rest" in spans[0][2]


def test_read_group_balanced():
    src = r"{a {b {c}} d}"
    content, end = read_group(src, 0)
    assert content == "a {b {c}} d" and end == len(src)
    assert read_group("{unbalanced", 0) is None


def test_counter_tree_alpha():
    assert to_alpha(1) == "A" and to_alpha(26) == "Z" and to_alpha(27) == "AA"


def test_swapnumbers():
    doc = r"""
\swapnumbers
\newtheorem{theorem}{Theorem}
\begin{document}
\begin{theorem} x \end{theorem}
\end{document}"""
    assert extract_theorems(doc)[0].name == "1. Theorem"


def test_macro_recursion_guard():
    # self-recursive macro must not hang or blow up
    doc = r"""
\newcommand{\loop}{\loop x}
\newtheorem{theorem}{Theorem}
\begin{document}
\begin{theorem} safe \end{theorem}
\end{document}"""
    thms = extract_theorems(doc)
    assert len(thms) == 1


def test_optional_default_arg_macro():
    table = collect_macros(r"\newcommand{\greet}[2][World]{Hello #1 and #2}")
    out = expand_macros(r"\greet{Bob} \greet[Ann]{Cid}", table)
    assert "Hello World and Bob" in out
    assert "Hello Ann and Cid" in out


def test_restatable_numbers_on_inner_env():
    """thm-restate: \\begin{restatable}{theorem}{cmd} numbers on theorem's
    counter, interleaved with plain theorem environments."""
    doc = r"""
\newtheorem{theorem}{Theorem}[section]
\begin{document}
\section{Intro}
\begin{theorem} plain first \end{theorem}
\begin{restatable}[Main]{theorem}{mainthm}
\label{thm:main} Every restatable theorem is extracted once.
\end{restatable}
Later we recall it: \mainthm*
\end{document}"""
    thms = extract_theorems(doc)
    assert len(thms) == 2                       # the \mainthm* use is a macro
    assert thms[0].name == "Theorem 1.1."
    assert thms[1].name == "Theorem 1.2. (Main)"
    assert thms[1].label == "thm:main"
    assert "extracted once" in thms[1].body
    assert "mainthm" not in thms[1].body        # command arg stripped


def test_restatable_starred_unnumbered():
    doc = r"""
\newtheorem{theorem}{Theorem}
\begin{document}
\begin{restatable*}{theorem}{foo} unnumbered body \end{restatable*}
\begin{theorem} counted \end{theorem}
\end{document}"""
    thms = extract_theorems(doc)
    assert thms[0].name == "Theorem"            # no counter step
    assert thms[1].name == "Theorem 1."         # starred form didn't consume 1


def test_extractor_never_crashes_on_adversarial_soup():
    """Pathological TeX is the ingest pipeline's daily diet (the reference
    wraps every parse in a kill-able child for this reason). The extractor
    itself must never raise on garbage: unbalanced braces/environments,
    truncated declarations, comment/verbatim edge cases, macro bombs."""
    import random

    rng = random.Random(0)
    tokens = [
        r"\begin{theorem}", r"\end{theorem}", r"\begin{restatable}",
        r"\end{restatable}", "{", "}", "[", "]", "$", "%", "\\\\",
        r"\newtheorem", r"\newtheorem{", r"\newtheorem{t}{T}[",
        r"\declaretheorem[name=", r"\label{", r"\label{x}",
        r"\newcommand{\a}{\a}", r"\def\b{\b\b}", r"\begin{verbatim}",
        r"\end{verbatim}", r"\section{", r"\appendix", "text ", "\n\n",
        r"\begin{restatable*}{theorem}", r"\input{x}", "\x00", "é",
    ]
    for trial in range(60):
        doc = "".join(rng.choice(tokens) for _ in range(rng.randrange(5, 120)))
        out = extract_theorems(doc)          # must not raise
        assert isinstance(out, list)
    # truncated real-ish document
    good = (
        "\\newtheorem{theorem}{Theorem}\\begin{document}"
        "\\begin{theorem} ok \\end{theorem}\\end{document}"
    )
    for cut in range(0, len(good), 7):
        assert isinstance(extract_theorems(good[:cut]), list)


def test_theorem_within_subsection_renders_full_chain():
    """[subsection]-numbered theorems carry the section component and
    restart at section boundaries (LaTeX: \\thesubsection =
    \\thesection.\\arabic{subsection})."""
    from theoremsearch_tpu.ingest.latex.extract import extract_theorems

    src = r"""
\documentclass{article}
\newtheorem{thm}{Theorem}[subsection]
\begin{document}
\section{A}\section{B}
\subsection{x}\subsection{y}\subsection{z}\subsection{w}
\begin{thm} first \end{thm}
\begin{thm} second \end{thm}
\section{C}
\subsection{u}
\begin{thm} third \end{thm}
\end{document}
"""
    names = [t.name for t in extract_theorems(src)]
    assert names == ["Theorem 2.4.1.", "Theorem 2.4.2.", "Theorem 3.1.1."]


def test_chapter_wires_lazily():
    """Sections render bare in article class; after a \\chapter they
    number within it (book class)."""
    from theoremsearch_tpu.ingest.latex.numbering import CounterTree

    t = CounterTree()
    t.define_env("thm", "Theorem", within="section")
    t.step_structural("section")
    assert t.begin_env("thm") == "Theorem 1.1."
    t2 = CounterTree()
    t2.define_env("thm", "Theorem", within="section")
    t2.step_structural("chapter")
    t2.step_structural("section")
    t2.step_structural("chapter")  # resets section
    t2.step_structural("section")
    assert t2.begin_env("thm") == "Theorem 2.1.1."


def test_commented_comment_env_does_not_swallow_text():
    """A commented-out `% \\begin{comment}` must not delete live source
    up to a later real \\end{comment}."""
    from theoremsearch_tpu.ingest.latex.scanner import strip_comments

    src = (
        "before\n% \\begin{comment}\n"
        "\\begin{theorem} real content \\end{theorem}\n"
        "\\begin{comment}dead\\end{comment}\nafter\n"
    )
    out = strip_comments(src)
    assert "real content" in out
    assert "dead" not in out
