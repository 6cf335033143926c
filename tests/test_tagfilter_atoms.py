"""Ported from the reference per-atom truth-table tests
(library/src/commonTest/.../tagfilter/filters/*Test.kt)."""

from osm_legal_default_speeds_spark.functions.tagfilter_ast import (
    HasKey,
    HasKeyLike,
    HasTag,
    HasTagGreaterOrEqualThan,
    HasTagGreaterThan,
    HasTagLessOrEqualThan,
    HasTagLessThan,
    HasTagLike,
    HasTagValueLike,
    NotHasKey,
    NotHasKeyLike,
    NotHasTag,
    NotHasTagValueLike,
    RegexOrSet,
    RelevantKeyRegex,
    RelevantKeyString,
)


def test_has_key():
    f = HasKey("name")
    assert f.matches({"name": "yes"})
    assert f.matches({"name": "no"})
    assert not f.matches({"neme": "no"})
    assert not f.matches({})
    assert str(f) == "name"
    assert f.relevant_key() == RelevantKeyString("name")


def test_not_has_key():
    f = NotHasKey("name")
    assert not f.matches({"name": "yes"})
    assert not f.matches({"name": "no"})
    assert f.matches({"neme": "no"})
    assert f.matches({})
    assert str(f) == "!name"


def test_has_tag():
    f = HasTag("highway", "residential")
    assert f.matches({"highway": "residential"})
    assert not f.matches({"highway": "residental"})
    assert not f.matches({"hipway": "residential"})
    assert not f.matches({})
    assert str(f) == "highway = residential"


def test_not_has_tag():
    f = NotHasTag("highway", "residential")
    assert not f.matches({"highway": "residential"})
    assert f.matches({"highway": "residental"})
    assert f.matches({"hipway": "residential"})
    assert f.matches({})
    assert str(f) == "highway != residential"


def test_has_key_like():
    f = HasKeyLike("n.[ms]e")
    assert f.matches({"name": "adsf"})
    assert f.matches({"nase": "fefff"})
    assert f.matches({"neme": "no"})
    assert not f.matches({"a name yo": "no"})  # fullmatch, not substring
    assert f.matches({"n(se": "no"})
    assert not f.matches({})
    assert str(f) == "~n.[ms]e"
    rk = f.relevant_key()
    assert isinstance(rk, RelevantKeyRegex) and not rk.regex.is_set
    assert rk.regex.pattern == "n.[ms]e"


def test_not_has_key_like():
    f = NotHasKeyLike("n.[ms]e")
    assert not f.matches({"name": "adsf"})
    assert not f.matches({"nase": "fefff"})
    assert not f.matches({"neme": "no"})
    assert f.matches({"a name yo": "no", "another name yo": "no"})
    assert not f.matches({"n(se": "no"})
    assert f.matches({})
    assert str(f) == "!~n.[ms]e"


def test_has_tag_value_like_dot():
    f = HasTagValueLike("highway", ".esidential")
    assert f.matches({"highway": "residential"})
    assert f.matches({"highway": "wesidential"})
    assert not f.matches({"highway": "rresidential"})
    assert not f.matches({})
    assert str(HasTagValueLike("highway", ".esidential")) == "highway ~ .esidential"


def test_has_tag_value_like_or():
    f = HasTagValueLike("highway", "residential|unclassified")
    assert f.matches({"highway": "residential"})
    assert f.matches({"highway": "unclassified"})
    assert not f.matches({"highway": "blub"})
    assert not f.matches({})
    assert f.relevant_key() == RelevantKeyString("highway")


def test_has_tag_value_like_character_class():
    f = HasTagValueLike("maxspeed", "([1-9]|[1-2][0-9]|3[0-5]) mph")
    for good in ("1 mph", "5 mph", "15 mph", "25 mph", "35 mph"):
        assert f.matches({"maxspeed": good})
    for bad in ("40 mph", "45 mph", "135 mph"):
        assert not f.matches({"maxspeed": bad})
    assert not f.matches({})


def test_not_has_tag_value_like_dot():
    f = NotHasTagValueLike("highway", ".*")
    assert not f.matches({"highway": "anything"})
    assert f.matches({})  # absent key -> True
    assert str(f) == "highway !~ .*"


def test_not_has_tag_value_like_or():
    f = NotHasTagValueLike("noname", "yes")
    assert not f.matches({"noname": "yes"})
    assert f.matches({"noname": "no"})
    assert f.matches({})


def test_has_tag_like_regex_key_and_value():
    f = HasTagLike(".ame", "y.s")
    assert f.matches({"name": "yes"})
    assert f.matches({"lame": "yos"})
    assert not f.matches({"lame": "no"})
    assert not f.matches({"good": "yes"})
    assert not f.matches({"neme": "no"})
    assert not f.matches({"names": "yess"})  # only entire string is matched
    assert not f.matches({})
    assert str(f) == "~.ame ~ y.s"


def test_has_tag_like_exact_without_regexp():
    f = HasTagLike("shop", "cheese")
    assert f.matches({"shop": "cheese"})
    assert not f.matches({"shop": "cheese_frog_swamp"})


def test_has_tag_like_piped_list():
    f = HasTagLike("shop", "cheese|greengrocer")
    assert f.matches({"shop": "cheese"})
    assert f.matches({"shop": "greengrocer"})
    assert not f.matches({"shop": "cheese_frog_swamp"})
    assert not f.matches({"shop": "cheese|greengrocer"})
    rk = f.relevant_key()
    assert rk.regex.is_set and set(rk.regex.members) == {"shop"}


def test_comparisons():
    ge = HasTagGreaterOrEqualThan("width", 3.5)
    gt = HasTagGreaterThan("width", 3.5)
    le = HasTagLessOrEqualThan("width", 3.5)
    lt = HasTagLessThan("width", 3.5)
    for f in (ge, gt, le, lt):
        assert not f.matches({})
        assert not f.matches({"width": "broad"})
    assert ge.matches({"width": "3.6"})
    assert ge.matches({"width": "3.5"})
    assert not ge.matches({"width": "3.4"})
    assert gt.matches({"width": "3.6"})
    assert not gt.matches({"width": "3.5"})
    assert not gt.matches({"width": "3.4"})
    assert not le.matches({"width": "3.6"})
    assert le.matches({"width": "3.5"})
    assert le.matches({"width": "3.4"})
    assert not lt.matches({"width": "3.6"})
    assert not lt.matches({"width": "3.5"})
    assert lt.matches({"width": "3.4"})
    assert str(ge) == "width >= 3.5"
    assert str(gt) == "width > 3.5"
    assert str(le) == "width <= 3.5"
    assert str(lt) == "width < 3.5"


def test_regex_or_set():
    r = RegexOrSet("a|b|c")
    assert r.is_set
    assert r.matches("a")
    assert r.matches("b")
    assert r.matches("c")
    assert not r.matches("d")
    assert not r.matches("a|b")


def test_has_tag_like_null_map_value():
    """map<string,string> VALUES are nullable in Spark and arrive as
    None in the Arrow batch: every classification (set and real-regex)
    must degrade to no-match like the native column path (null ->
    coalesced false), not raise from re.fullmatch(None)."""
    real = HasTagLike("maxspeed.*", "[0-9]+")  # RealRegex value pattern
    assert not real.matches({"maxspeed:hgv": None})
    assert real.matches({"maxspeed:hgv": None, "maxspeed": "30"})
    piped = HasTagLike("shop|craft", "car|boat")  # IN-set value pattern
    assert not piped.matches({"shop": None})
    # value-only atoms already guard; keep them pinned alongside
    assert not HasTagValueLike("shop", "car|boat").matches({"shop": None})
    assert NotHasTagValueLike("shop", "car|boat").matches({"shop": None})
