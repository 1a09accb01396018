import textwrap

from nerfmatch_tpu.config import (
    dict2namespace,
    load_yaml_config,
    merge_configs,
    namespace2dict,
    resolve_wildcards,
    save_config,
    update_configs,
)


def test_dict_namespace_roundtrip():
    d = {"a": 1, "b": {"c": [1, 2], "d": {"e": "x"}}}
    ns = dict2namespace(d)
    assert ns.b.d.e == "x"
    assert namespace2dict(ns) == d


def test_merge_and_update():
    old = dict2namespace({"a": 1, "b": 2})
    new = {"b": 3, "c": 4}
    merged = merge_configs(old, new)
    assert merged.a == 1 and merged.b == 3 and merged.c == 4
    updated = update_configs(old, new)
    assert updated.b == 3 and not hasattr(updated, "c")


def test_yaml_inherit(tmp_path):
    parent = tmp_path / "parent.yaml"
    parent.write_text(textwrap.dedent("""
        base:
          lr: 0.1
          epochs: 10
    """))
    child = tmp_path / "child.yaml"
    child.write_text(textwrap.dedent("""
        inherit:
          path: parent.yaml
          key: base
        epochs: 20
    """))
    ns, raw = load_yaml_config(child)
    assert ns.lr == 0.1
    assert ns.epochs == 20
    assert "inherit" not in raw


def test_save_config_roundtrip(tmp_path):
    ns = dict2namespace({"x": {"y": 5}})
    p = tmp_path / "out.yaml"
    save_config(p, ns)
    ns2, _ = load_yaml_config(p)
    assert ns2.x.y == 5


def test_wildcards():
    assert (
        resolve_wildcards("data/#scene/transforms_#split.json", "chess", "train")
        == "data/chess/transforms_train.json"
    )
