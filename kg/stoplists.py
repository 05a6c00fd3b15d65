"""Vendored stopword tiers + symbol lists (static, no nltk/sklearn).

Reproduces the three-tier stoplist structure the reference builds at
/root/reference/src/hu_entity/spacy_wrapper.py:179-255 (nltk + sklearn lists
unioned/differenced per language). Those upstream word lists are public; we
vendor compact equivalents here since nltk/sklearn are unavailable in this
environment (SURVEY.md §7). Tier semantics:

- SMALL: empty for en (spacy_wrapper.py:216).
- LARGE: base list + extended list, MINUS question words (why/when/where/how/
  which/what/whose/whom) so intent-bearing wh-words survive
  (spacy_wrapper.py:205-213).
- XLARGE: the full union (spacy_wrapper.py:200-203).

Non-en languages: SMALL == LARGE == XLARGE == that language's base list
(es: SMALL/LARGE empty, spacy_wrapper.py:221-227).
"""

from __future__ import annotations

import string

# NLTK-style English base list (public domain word list).
_EN_BASE = frozenset(
    """a about above after again against all am an and any are aren't as at be
because been before being below between both but by can't cannot could
couldn't did didn't do does doesn't doing don't down during each few for from
further had hadn't has hasn't have haven't having he he'd he'll he's her here
here's hers herself him himself his how how's i i'd i'll i'm i've if in into
is isn't it it's its itself let's me more most mustn't my myself no nor not of
off on once only or other ought our ours ourselves out over own same shan't
she she'd she'll she's should shouldn't so some such than that that's the
their theirs them themselves then there there's these they they'd they'll
they're they've this those through to too under until up very was wasn't we
we'd we'll we're we've were weren't what what's when when's where where's
which while who who's whom why why's with won't would wouldn't you you'd
you'll you're you've your yours yourself yourselves""".split()
)

# sklearn-ENGLISH_STOP_WORDS-style extension (public word list, trimmed).
_EN_EXTENDED = frozenset(
    """much herein thru per somehow throughout almost somewhere whereafter
nevertheless indeed hereby across within co yet elsewhere whence seeming un
whither mine whether also thus amongst thereafter mostly amoungst therefore
seems something thereby others hereupon us everyone perhaps please hence due
seemed else beside therein couldnt moreover anyway whatever anyhow de among
besides though either rather might noone eg thereupon may namely ie sincere
whereby con latterly becoming meanwhile afterwards thence whoever otherwise
anything however whereas although hereafter already beforehand etc whenever
even someone whereupon inc sometimes ltd cant become becomes became behind
bottom call cry describe detail done down eight eleven empty enough every
everything everywhere except fifteen fifty fill find fire first five former
formerly forty found four front full get give go hasnt hundred interest keep
last least less many mill more most move name neither never next nine nobody
none nothing now nowhere often one onto part put rather re same see serious
several show side since six sixty sometime still system take ten third three
thick thin together top toward towards twelve twenty two until upon well
whole will""".split()
)

_CLITICS = frozenset({"n't", "'s", "'m", "ca"})

_WH_WORDS = frozenset({"why", "when", "where", "how", "which", "what", "whose", "whom"})

_ES_BASE = frozenset(
    """de la que el en y a los del se las por un para con no una su al lo como
mas pero sus le ya o este si porque esta entre cuando muy sin sobre tambien me
hasta hay donde quien desde todo nos durante todos uno les ni contra otros ese
eso ante ellos e esto mi antes algunos que unos yo otro otras otra el tanto esa
estos mucho quienes nada muchos cual poco ella estar estas algunas algo
nosotros""".split()
)

_FR_BASE = frozenset(
    """au aux avec ce ces dans de des du elle en et eux il ils je la le les leur
lui ma mais me meme mes moi mon ne nos notre nous on ou par pas pour qu que qui
sa se ses son sur ta te tes toi ton tu un une vos votre vous c d j l m n s t y
ete etee etees etes etant suis es est sommes etes sont serai seras sera serons
serez seront""".split()
)

_IT_BASE = frozenset(
    """ad al allo ai agli all agl alla alle con col coi da dal dallo dai dagli
dall dagl dalla dalle di del dello dei degli dell degl della delle in nel nello
nei negli nell negl nella nelle su sul sullo sui sugli sull sugl sulla sulle
per tra contro io tu lui lei noi voi loro mio mia miei mie tuo tua tuoi tue suo
sua suoi sue nostro nostra nostri nostre vostro vostra vostri vostre e sono""".split()
)

_PT_BASE = frozenset(
    """de a o que e do da em um para e com nao uma os no se na por mais as dos
como mas foi ao ele das tem a seu sua ou ser quando muito ha nos ja esta eu
tambem so pelo pela ate isso ela entre era depois sem mesmo aos ter seus quem
nas me esse eles estao voce tinha foram essa num nem suas meu as minha tem
numa pelos elas havia seja qual sera nos tenho lhe deles essas esses pelas
este fosse dele""".split()
)

_NL_BASE = frozenset(
    """de en van ik te dat die in een hij het niet zijn is was op aan met als
voor had er maar om hem dan zou of wat mijn men dit zo door over ze zich bij
ook tot je mij uit der daar haar naar heb hoe heeft hebben deze u want nog zal
me zij nu ge geen omdat iets worden toch al waren veel meer doen toen moet ben
zonder kan hun dus alles onder ja eens hier wie werd altijd doch wordt wezen
kunnen ons zelf tegen na reeds wil kon niets uw iemand geweest andere""".split()
)

_BASE_BY_LANG = {
    "es": _ES_BASE,
    "fr": _FR_BASE,
    "it": _IT_BASE,
    "pt": _PT_BASE,
    "nl": _NL_BASE,
}

_COMMON_SYMBOLS = ["-----", "---", "...", "“", "”", '"']


def symbols(lang: str = "en") -> frozenset[str]:
    """Tokens treated as pure symbols and dropped (spacy_wrapper.py:217-220)."""
    extra = {"en": ["'ve"], "es": ["¿"]}.get(lang, [])
    return frozenset(list(string.punctuation) + _COMMON_SYMBOLS + extra)


def stoplist(lang: str = "en", size: str = "small") -> frozenset[str]:
    """Return the stopword set for (lang, size); size in {small,large,xlarge}."""
    size = size.lower()
    if size not in {"small", "large", "xlarge"}:
        raise ValueError(f"invalid stopword size {size!r}")
    if lang == "en":
        if size == "small":
            return frozenset()
        if size == "large":
            return frozenset((_EN_BASE | _EN_EXTENDED | _CLITICS) - _WH_WORDS)
        return frozenset(_EN_BASE | _EN_EXTENDED | _CLITICS)
    if lang == "es" and size in {"small", "large"}:
        return frozenset()
    base = _BASE_BY_LANG.get(lang)
    if base is None:
        raise ValueError(f"language {lang!r} is not available")
    return base
