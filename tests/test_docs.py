"""Generated docs (genestrip_tpu/docs.py) cannot drift from the code:
every registered config key has a doc line, every documented goal exists in
the registry, and every registered user goal is documented (ref: the
reference's GenDocFiles contract for ConfigParams.md/Goals.md)."""

from fixtures import make_dengue_world

from genestrip_tpu.config import KEYS
from genestrip_tpu.docs import GOAL_DOCS, KEY_DOCS, config_params_md, goals_md
from genestrip_tpu.maker import GSMaker


def test_every_key_documented():
    missing = [k for k in KEYS if k not in KEY_DOCS]
    assert not missing, f"undocumented config keys: {missing}"
    stale = [k for k in KEY_DOCS if k not in KEYS]
    assert not stale, f"documented but unregistered keys: {stale}"
    md = config_params_md()
    for k in KEYS:
        assert f"`{k}`" in md


def test_goal_docs_match_registry(tmp_path):
    project, *_ = make_dengue_world(tmp_path)
    maker = GSMaker(project)
    user_goals = {n for n, g in maker.maker.goals.items() if g.user_goal}
    undocumented = user_goals - set(GOAL_DOCS)
    assert not undocumented, f"undocumented user goals: {undocumented}"
    ghost = set(GOAL_DOCS) - set(maker.maker.goals)
    assert not ghost, f"documented goals not in registry: {ghost}"
    md = goals_md()
    for n in user_goals:
        assert f"`{n}`" in md


def test_write_docs(tmp_path):
    from genestrip_tpu.docs import write_docs
    write_docs(tmp_path)
    assert (tmp_path / "ConfigParams.md").read_text().startswith("# Config")
    assert (tmp_path / "Goals.md").read_text().startswith("# Goals")
