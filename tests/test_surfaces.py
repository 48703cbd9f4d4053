"""User-surface tests: CLI argument handling, web UI gating, i18n."""
import numpy as np
import pytest


def test_cli_missing_voice(tmp_path, capsys):
    from index_tts_dubbing_tpu import cli
    rc = cli.main(["hello", "-v", str(tmp_path / "nope.wav")])
    assert rc == 1
    assert "not found" in capsys.readouterr().err


def test_cli_no_overwrite(tmp_path, capsys):
    from index_tts_dubbing_tpu import cli
    from index_tts_dubbing_tpu.utils.audio import write_wav
    voice = tmp_path / "v.wav"
    write_wav(voice, np.zeros(100, np.float32), 24000)
    out = tmp_path / "o.wav"
    out.write_bytes(b"x")
    rc = cli.main(["hello", "-v", str(voice), "-o", str(out)])
    assert rc == 1
    assert "exists" in capsys.readouterr().err


def test_webui_gated_without_gradio(monkeypatch):
    import builtins
    import sys
    from index_tts_dubbing_tpu import webui
    real_import = builtins.__import__

    def block_gradio(name, *a, **k):
        if name == "gradio":
            raise ImportError("no gradio")
        return real_import(name, *a, **k)

    monkeypatch.delitem(sys.modules, "gradio", raising=False)
    monkeypatch.setattr(builtins, "__import__", block_gradio)
    with pytest.raises(ImportError):
        webui.build_demo(object())
    assert webui.main([]) == 1


def test_i18n():
    from index_tts_dubbing_tpu.utils.i18n import I18nAuto
    zh = I18nAuto("zh_CN")
    assert zh("Generate") == "生成"
    assert zh("unmapped key") == "unmapped key"
    en = I18nAuto("en_US")
    assert en("Generate") == "Generate"


def test_webui_utils_paging():
    from index_tts_dubbing_tpu.utils import webui_utils as w
    items = list(range(45))
    assert w.page_slice(1, items) == list(range(20))
    assert w.page_slice(3, items) == list(range(40, 45))
    page, has_next, has_prev = w.next_page(1, items)
    assert (page, has_next, has_prev) == (2, True, True)
    page, has_next, has_prev = w.next_page(2, items)
    assert (page, has_next) == (3, False)
    assert "center" in w.html_center("x")
