"""i18n loader: MatchTool.Lang-format INI parsing + CLI translation
fallbacks (the reference's language mechanism,
MatchTool/MatchToolDlg.cpp:618-709)."""

import numpy as np
import pytest

from fastest_image_pattern_matching_tpu.utils.i18n import (
    Translator, available_languages, parse_lang_file)


LANG_INI = """\
[Deutsch]
Score=Punktzahl
Index=Nr
ExecutionTime=Laufzeit

[Chinese_Traditional]
Score=分數
"""


@pytest.fixture()
def lang_file(tmp_path):
    p = tmp_path / "test.Lang"
    p.write_text(LANG_INI, encoding="utf-8")
    return str(p)


def test_parse_sections(lang_file):
    langs = parse_lang_file(lang_file)
    assert available_languages(lang_file) == ["Chinese_Traditional",
                                              "Deutsch"]
    assert langs["Deutsch"]["Score"] == "Punktzahl"
    assert langs["Chinese_Traditional"]["Score"] == "分數"


def test_translator_fallbacks(lang_file):
    tr = Translator("Deutsch", lang_file)
    assert tr.t("Score") == "Punktzahl"
    assert tr.t("PosX") == "PosX"               # builtin English fallback
    assert tr.t("NoSuchKey") == "NoSuchKey"     # key fallback
    default = Translator()                      # no file: English only
    assert default.t("ExecutionTime") == "Execution time"


def test_unknown_language_raises(lang_file):
    with pytest.raises(ValueError, match="not in"):
        Translator("Klingon", lang_file)


def test_reads_reference_lang_file():
    """Format compatibility with the reference's own MatchTool.Lang."""
    path = "/root/reference/MatchTool/MatchTool.Lang"
    langs = parse_lang_file(path)
    assert "Chinese_Traditional" in langs
    # every language section carries the results-table keys
    for lang, tab in langs.items():
        assert "Score" in tab, lang


def test_utf16_roundtrip(tmp_path):
    p = tmp_path / "u16.Lang"
    p.write_bytes(LANG_INI.encode("utf-16"))
    assert parse_lang_file(str(p))["Deutsch"]["Index"] == "Nr"


def test_cli_lang_output(tmp_path, lang_file):
    """CLI table headers come out translated."""
    import cv2
    from fastest_image_pattern_matching_tpu import cli

    rng = np.random.default_rng(0)
    tpl = rng.integers(0, 255, (32, 32), dtype=np.uint8)
    scene = rng.integers(80, 150, (128, 128), dtype=np.uint8)
    scene[40:72, 50:82] = tpl
    sp, tp = str(tmp_path / "s.png"), str(tmp_path / "t.png")
    cv2.imwrite(sp, scene)
    cv2.imwrite(tp, tpl)
    import contextlib, io
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = cli.main(["match", "-s", sp, "-t", tp, "--tolerance-angle",
                       "0", "--max-pos", "3", "--no-settings",
                       "--lang", "Deutsch", "--lang-file", lang_file])
    out = buf.getvalue()
    assert rc == 0
    assert "Laufzeit" in out and "Punktzahl" in out


def test_lang_without_file_errors():
    import pytest
    with pytest.raises(ValueError):
        Translator("Deutsch", None)
    with pytest.raises(ValueError):
        Translator(None, "/tmp/nonexistent.lang")


def test_cli_lang_without_file_clean_error(tmp_path, capsys):
    """--lang without --lang-file must exit 2 with a message, not a
    traceback (the Translator ValueError is caught by the CLI)."""
    import cv2
    import numpy as np
    from fastest_image_pattern_matching_tpu.cli import main
    from fastest_image_pattern_matching_tpu.utils.imageio import save_gray
    t = np.full((24, 32), 128, np.uint8)
    t[6:18, 8:24] = 30
    src = np.full((100, 120), 128, np.uint8)
    src[20:44, 30:62] = t
    sp, tp = str(tmp_path / "s.bmp"), str(tmp_path / "t.bmp")
    save_gray(sp, src)
    save_gray(tp, t)
    rc = main(["match", "-s", sp, "-t", tp, "--tolerance-angle", "0",
               "--no-settings", "--lang", "Deutsch"])
    assert rc == 2
    assert "lang" in capsys.readouterr().err
