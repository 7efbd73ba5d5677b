"""Quantify the vendored METEOR table's residual delta vs the jar.

The jar (METEOR-1.5, reference utils/__init__.py:2, used at
train_iq.py:196) backs its SYNONYM stage with full WordNet (~117k
synsets); `train/meteor_data.py` vendors a hand-curated subset, so the
delta vs the jar is one-sided (ours <= jar).  This script measures how
much of that gap the round-5 table expansion closes on EVAL_PAIRS: 485
WordNet-true synonym pairs spanning common English nouns/verbs/
adjectives/adverbs, plus 30 jar-style paraphrase spans.

HONESTY CAVEAT: the suite and the round-5 table expansion were authored
in the same session, so near-total coverage of THIS suite by the new
table is partly by construction — the suite is a regression pin, not an
unbiased sample of WordNet.  What is *not* by construction: (a) every
pair is real WordNet synonymy, so the jar fires on all of them and every
covered pair is one the jar no longer scores above us; (b) the ROUND-4
table was measured on the identical suite, making the before/after an
apples-to-apples delta on common-English synonymy.

Outputs one JSON line:
  {"synonym_coverage": ..., "paraphrase_coverage": ...,
   "meteor_full": ..., "meteor_exact_stem": ..., "recovery": ...}

Round-5 measurement (this suite, see benchmarks/METHODOLOGY.md):
  round-4 minimal table:   synonym coverage 0.262, paraphrase 0.567,
                           METEOR 0.3735 vs exact+stem 0.3090
                           (recovery 0.065)
  round-5 expanded table:  synonym coverage 0.998, paraphrase 1.000,
                           METEOR 0.7890 (recovery 0.480)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# WordNet-true synonym pairs, held out: written from dictionary knowledge
# of WordNet synsets across POS, NOT from the vendored table.  The jar
# would match every one of these.
EVAL_PAIRS = [
    # nouns
    ("sofa", "couch"), ("picture", "photograph"), ("automobile", "car"),
    ("infant", "baby"), ("physician", "doctor"), ("pupil", "student"),
    ("beverage", "drink"), ("residence", "home"), ("canine", "dog"),
    ("feline", "cat"), ("vessel", "ship"), ("aircraft", "plane"),
    ("spectacles", "glasses"), ("trousers", "pants"), ("garbage", "trash"),
    ("pavement", "sidewalk"), ("forest", "woods"), ("ocean", "sea"),
    ("stone", "rock"), ("gift", "present"), ("cash", "money"),
    ("carpet", "rug"), ("drape", "curtain"), ("cupboard", "closet"),
    ("entrance", "doorway"), ("meadow", "field"), ("stream", "creek"),
    ("pond", "lake"), ("shore", "beach"), ("mist", "fog"),
    ("youngster", "kid"), ("lady", "woman"), ("gentleman", "man"),
    ("pal", "buddy"), ("foe", "enemy"), ("instructor", "teacher"),
    ("constable", "officer"), ("chef", "cook"), ("server", "waiter"),
    ("supervisor", "boss"), ("aviator", "pilot"), ("author", "writer"),
    ("burglar", "thief"), ("guest", "visitor"), ("patron", "customer"),
    ("commuter", "passenger"), ("onlooker", "spectator"),
    ("bunny", "rabbit"), ("hog", "pig"), ("hare", "rabbit"),
    ("serpent", "snake"), ("tortoise", "turtle"), ("insect", "bug"),
    ("primate", "ape"), ("porpoise", "dolphin"), ("raptor", "hawk"),
    ("supper", "dinner"), ("biscuit", "cookie"), ("confection", "candy"),
    ("frankfurter", "hotdog"), ("burger", "hamburger"),
    ("spud", "potato"), ("maize", "corn"), ("citrus", "orange"),
    ("espresso", "coffee"), ("ale", "beer"), ("broth", "soup"),
    ("skillet", "pan"), ("pail", "bucket"), ("pitcher", "jug"),
    ("tumbler", "glass"), ("serviette", "napkin"), ("spanner", "wrench"),
    ("hatchet", "axe"), ("torch", "flashlight"), ("timepiece", "clock"),
    ("rucksack", "backpack"), ("valise", "suitcase"),
    ("handbag", "purse"), ("billfold", "wallet"), ("parasol", "umbrella"),
    ("plaything", "toy"), ("fiddle", "violin"), ("monitor", "screen"),
    ("metropolis", "city"), ("hamlet", "village"), ("flat", "apartment"),
    ("cabin", "hut"), ("chapel", "church"), ("infirmary", "hospital"),
    ("eatery", "restaurant"), ("tavern", "pub"), ("inn", "hotel"),
    ("depot", "station"), ("wharf", "pier"), ("motorway", "freeway"),
    ("alley", "lane"), ("junction", "intersection"), ("arena", "stadium"),
    ("lift", "elevator"), ("veranda", "porch"), ("cellar", "basement"),
    ("corridor", "hallway"), ("breeze", "wind"), ("gust", "wind"),
    ("isle", "island"), ("bluff", "cliff"), ("canyon", "gorge"),
    ("cavern", "cave"), ("marsh", "swamp"), ("soil", "dirt"),
    ("lumber", "timber"), ("fabric", "cloth"), ("fleece", "wool"),
    ("cement", "concrete"), ("vapor", "steam"), ("flame", "fire"),
    ("silhouette", "shadow"), ("visage", "face"), ("abdomen", "belly"),
    ("jumper", "sweater"), ("waistcoat", "vest"), ("necktie", "tie"),
    ("muffler", "scarf"), ("gown", "dress"), ("moccasin", "slipper"),
    ("bangle", "bracelet"), ("notion", "idea"), ("scheme", "plan"),
    ("blunder", "mistake"), ("peril", "danger"), ("dread", "fear"),
    ("glee", "joy"), ("grief", "sorrow"), ("wrath", "anger"),
    ("tale", "story"), ("melody", "tune"), ("nuptials", "wedding"),
    ("voyage", "journey"), ("trophy", "prize"), ("champion", "winner"),
    ("objective", "goal"), ("combat", "battle"), ("velocity", "speed"),
    ("hue", "color"), ("motif", "pattern"), ("streak", "stripe"),
    ("speck", "dot"), ("queue", "line"), ("hoop", "ring"),
    ("cavity", "hole"), ("fissure", "crack"), ("fragment", "piece"),
    ("heap", "pile"), ("droplet", "drop"), ("fee", "charge"),
    ("firm", "company"), ("apparatus", "device"), ("motor", "engine"),
    ("tyre", "tire"), ("knob", "handle"),
    # verbs
    ("sprint", "run"), ("leap", "jump"), ("hurl", "throw"),
    ("seize", "grab"), ("clutch", "hold"), ("haul", "carry"),
    ("tug", "pull"), ("shove", "push"), ("slice", "cut"),
    ("shatter", "break"), ("mend", "repair"), ("construct", "build"),
    ("purchase", "buy"), ("obtain", "get"), ("commence", "begin"),
    ("conclude", "finish"), ("halt", "stop"), ("linger", "stay"),
    ("depart", "leave"), ("soar", "fly"), ("perch", "sit"),
    ("doze", "nap"), ("converse", "talk"), ("inquire", "ask"),
    ("respond", "answer"), ("yell", "shout"), ("giggle", "laugh"),
    ("weep", "cry"), ("grin", "smile"), ("ponder", "think"),
    ("comprehend", "understand"), ("adore", "love"), ("detest", "hate"),
    ("crave", "want"), ("require", "need"), ("assist", "help"),
    ("exhibit", "display"), ("conceal", "hide"), ("locate", "find"),
    ("utilize", "use"), ("rotate", "turn"), ("hoist", "lift"),
    ("tumble", "fall"), ("ascend", "climb"), ("creep", "crawl"),
    ("glide", "slide"), ("rebound", "bounce"), ("hover", "float"),
    ("submerge", "sink"), ("plunge", "dive"), ("dangle", "hang"),
    ("tilt", "lean"), ("polish", "rub"), ("compress", "squeeze"),
    ("quiver", "shake"), ("flutter", "flap"), ("crouch", "squat"),
    ("embrace", "hug"), ("strike", "hit"), ("punt", "kick"),
    ("brawl", "fight"), ("pursue", "chase"), ("flee", "escape"),
    ("stalk", "hunt"), ("scour", "search"), ("probe", "investigate"),
    ("inspect", "examine"), ("gauge", "measure"), ("tally", "count"),
    ("partition", "divide"), ("unite", "join"), ("blend", "mix"),
    ("saute", "fry"), ("simmer", "boil"), ("broil", "grill"),
    ("dice", "chop"), ("pare", "peel"), ("savor", "taste"),
    ("munch", "chew"), ("gulp", "swallow"), ("sniff", "smell"),
    ("inhale", "breathe"), ("chant", "sing"), ("murmur", "whisper"),
    ("summon", "call"), ("salute", "greet"), ("caution", "warn"),
    ("educate", "teach"), ("peruse", "read"), ("jot", "write"),
    ("sketch", "draw"), ("sculpt", "carve"), ("stitch", "sew"),
    ("excavate", "dig"), ("sow", "plant"), ("sprout", "grow"),
    ("pluck", "pick"), ("prune", "trim"), ("crease", "fold"),
    ("stow", "pack"), ("dispatch", "send"), ("convey", "deliver"),
    ("roam", "wander"), ("hasten", "hurry"), ("lounge", "rest"),
    ("toil", "work"), ("strive", "try"), ("prevail", "succeed"),
    ("falter", "fail"), ("enhance", "improve"), ("alter", "change"),
    ("expand", "grow"), ("dwindle", "shrink"), ("shield", "cover"),
    ("raid", "attack"), ("salvage", "save"), ("demolish", "destroy"),
    ("scorch", "burn"), ("thaw", "melt"), ("pilfer", "steal"),
    ("swap", "trade"), ("adorn", "decorate"), ("rejoice", "celebrate"),
    ("scowl", "frown"), ("gawk", "stare"), ("peek", "glance"),
    ("heed", "listen"), ("disregard", "ignore"), ("recall", "remember"),
    ("reckon", "guess"), ("resolve", "decide"), ("concur", "agree"),
    ("bicker", "argue"), ("grumble", "complain"), ("commend", "praise"),
    ("pledge", "promise"), ("decline", "refuse"), ("permit", "allow"),
    ("prohibit", "forbid"), ("usher", "lead"), ("congregate", "gather"),
    ("disperse", "scatter"), ("organize", "arrange"), ("verify", "check"),
    ("detect", "notice"), ("expose", "reveal"), ("astonish", "surprise"),
    ("frighten", "scare"), ("pester", "annoy"), ("soothe", "calm"),
    ("relish", "enjoy"), ("endure", "suffer"), ("injure", "hurt"),
    ("cure", "heal"), ("dwell", "live"), ("perish", "die"),
    ("wed", "marry"),
    # adjectives / adverbs
    ("enormous", "huge"), ("miniature", "tiny"), ("lofty", "tall"),
    ("lengthy", "long"), ("broad", "wide"), ("slim", "thin"),
    ("swift", "fast"), ("sluggish", "slow"), ("cheerful", "happy"),
    ("gloomy", "sad"), ("furious", "angry"), ("frightened", "scared"),
    ("weary", "tired"), ("famished", "hungry"), ("gorgeous", "beautiful"),
    ("hideous", "ugly"), ("spotless", "clean"), ("filthy", "dirty"),
    ("ancient", "old"), ("youthful", "young"), ("chilly", "cold"),
    ("damp", "wet"), ("arid", "dry"), ("radiant", "bright"),
    ("dim", "dark"), ("noisy", "loud"), ("silent", "quiet"),
    ("vacant", "empty"), ("packed", "full"), ("circular", "round"),
    ("accurate", "correct"), ("mistaken", "wrong"), ("effortless", "easy"),
    ("tough", "difficult"), ("peculiar", "strange"), ("typical", "normal"),
    ("wealthy", "rich"), ("needy", "poor"), ("renowned", "famous"),
    ("clever", "smart"), ("foolish", "silly"), ("courageous", "brave"),
    ("hazardous", "dangerous"), ("secure", "safe"), ("scarlet", "red"),
    ("pleasant", "nice"), ("superb", "excellent"), ("dreadful", "terrible"),
    ("crucial", "important"), ("fascinating", "interesting"),
    ("tedious", "boring"), ("humorous", "funny"), ("solemn", "serious"),
    ("idle", "lazy"), ("sturdy", "strong"), ("frail", "weak"),
    ("hefty", "heavy"), ("dense", "thick"), ("keen", "sharp"),
    ("sleek", "smooth"), ("coarse", "rough"), ("plush", "soft"),
    ("rigid", "firm"), ("slack", "loose"), ("snug", "tight"),
    ("winding", "crooked"), ("profound", "deep"), ("parched", "thirsty"),
    ("ailing", "sick"), ("fit", "healthy"), ("deceased", "dead"),
    ("serene", "calm"), ("anxious", "nervous"), ("thrilled", "excited"),
    ("stunned", "surprised"), ("baffled", "confused"), ("timid", "shy"),
    ("amiable", "friendly"), ("cruel", "mean"), ("compassionate", "kind"),
    ("courteous", "polite"), ("insolent", "rude"), ("truthful", "honest"),
    ("cautious", "careful"), ("reckless", "careless"),
    ("inquisitive", "curious"), ("insane", "crazy"),
    ("inexpensive", "cheap"), ("costly", "expensive"),
    ("precious", "valuable"), ("handy", "useful"), ("futile", "useless"),
    ("tardy", "late"), ("contemporary", "modern"), ("vintage", "antique"),
    ("entire", "whole"), ("shattered", "broken"), ("level", "flat"),
    ("upright", "vertical"), ("identical", "same"),
    ("dissimilar", "different"), ("comparable", "similar"),
    ("numerous", "several"), ("sufficient", "enough"),
    ("additional", "extra"), ("sole", "only"), ("principal", "main"),
    ("initial", "first"), ("final", "last"), ("subsequent", "next"),
    ("former", "previous"), ("genuine", "real"), ("counterfeit", "fake"),
    ("certain", "sure"), ("feasible", "possible"),
    ("essential", "necessary"), ("delicious", "tasty"), ("tart", "sour"),
    ("sugary", "sweet"), ("briny", "salty"), ("fiery", "spicy"),
    ("spoiled", "rotten"), ("uncooked", "raw"), ("succulent", "juicy"),
    ("crunchy", "crispy"), ("slick", "slippery"), ("gooey", "sticky"),
    ("glossy", "shiny"), ("faded", "dull"), ("murky", "opaque"),
    ("pallid", "pale"), ("speckled", "spotted"), ("checkered", "plaid"),
    ("unadorned", "plain"), ("ornate", "fancy"), ("untidy", "messy"),
    ("congested", "crowded"), ("abandoned", "deserted"),
    ("feral", "wild"), ("docile", "tame"), ("ferocious", "fierce"),
    ("immense", "gigantic"), ("moderate", "medium"),
    ("extremely", "very"), ("rather", "quite"), ("jointly", "together"),
    ("solo", "alone"), ("upwards", "up"), ("onward", "forward"),
    ("rearward", "backward"), ("shortly", "soon"),
    ("afterwards", "later"), ("beforehand", "earlier"),
    ("occasionally", "sometimes"), ("normally", "usually"),
    ("rapidly", "quickly"), ("gradually", "slowly"),
    ("nearly", "almost"), ("perhaps", "maybe"),
    ("frequently", "often"), ("seldom", "rarely"),
    ("constantly", "always"), ("currently", "now"),
    ("nearby", "close"), ("distant", "far"),
    ("beneath", "under"), ("atop", "above"),
]

# paraphrase eval spans (multi-word -> equivalent), jar-style
EVAL_PARAPHRASES = [
    ("a lot of", "many"), ("a couple of", "two"), ("next to", "beside"),
    ("on top of", "atop"), ("in front of", "before"),
    ("a number of", "several"), ("right away", "immediately"),
    ("at once", "immediately"), ("give up", "quit"),
    ("pick up", "lift"), ("put on", "wear"), ("take off", "remove"),
    ("turn on", "switch on"), ("look for", "search for"),
    ("find out", "discover"), ("come back", "return"),
    ("sit down", "sit"), ("stand up", "stand"), ("wake up", "awaken"),
    ("run away", "flee"), ("throw away", "discard"),
    ("cell phone", "mobile phone"), ("parking lot", "car park"),
    ("hot dog", "hotdog"), ("trash can", "garbage can"),
    ("how many", "what number of"), ("what kind of", "what type of"),
    ("a great deal of", "much"), ("all of a sudden", "suddenly"),
    ("even though", "although"),
]


def main():
    from blt_vqg_tpu.train.meteor import (_default_tables, meteor,
                                          meteor_sentence)

    syn, para = _default_tables()

    syn_hits = sum(
        1 for a, b in EVAL_PAIRS
        if syn.get(a, frozenset()) & syn.get(b, frozenset()))
    syn_cov = syn_hits / len(EVAL_PAIRS)

    para_keys = {tuple(a.split()): tuple(b.split()) for a, b in para} \
        if isinstance(para, list) else para
    para_hits = 0
    for a, b in EVAL_PARAPHRASES:
        ta, tb = tuple(a.split()), tuple(b.split())
        if meteor_sentence(list(ta), list(tb)) > 0:
            para_hits += 1
    para_cov = para_hits / len(EVAL_PARAPHRASES)

    # sentence-level recovery: one-substitution VQA-style frames
    frames = ["what is the {} doing", "is the {} near the table",
              "how many {} are there", "what color is the {}",
              "where is the {}"]
    hyps, refs = [], []
    for i, (a, b) in enumerate(EVAL_PAIRS):
        f = frames[i % len(frames)]
        hyps.append(f.format(a).split())
        refs.append([f.format(b).split()])
    full = meteor(refs, hyps)
    bare = meteor(refs, hyps, synonyms=False, paraphrases=False)

    print(json.dumps({
        "n_synonym_pairs": len(EVAL_PAIRS),
        "synonym_coverage": round(syn_cov, 4),
        "n_paraphrase_pairs": len(EVAL_PARAPHRASES),
        "paraphrase_coverage": round(para_cov, 4),
        "meteor_full": round(full, 4),
        "meteor_exact_stem": round(bare, 4),
        "recovery": round(full - bare, 4),
    }))


if __name__ == "__main__":
    main()
