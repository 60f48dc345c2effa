"""Seed corpora: per-language phrase pools, stopwords, toxic lexicon.

These are the training data for the from-scratch langid / perplexity models
(models/langid.py, models/ngram.py) and the phrase pools for the synthetic
transcript generator (synth.py). Everything is embedded so the engine has
zero external dependencies and is fully deterministic.

The reference keeps its schema fixtures inline the same way
(/root/reference/data/input/proto/example.proto — a tiny committed fixture
rather than a downloaded artifact).
"""

from __future__ import annotations

# ~25 natural sentences per language. Used to train the hashed char-trigram
# language classifier and (en) the character n-gram LM.
SENTENCES: dict[str, list[str]] = {
    "en": [
        "The weather today is sunny with a light breeze from the north.",
        "She walked to the market to buy fresh bread and vegetables.",
        "Our team finished the project two days ahead of schedule.",
        "Please remember to turn off the lights when you leave the room.",
        "The library opens at nine in the morning on weekdays.",
        "He has been learning to play the guitar for three years.",
        "We should discuss the budget before making any decisions.",
        "The train was delayed because of heavy snow in the mountains.",
        "I would like a cup of coffee with milk and no sugar.",
        "The children played in the park until the sun went down.",
        "This restaurant serves the best pasta in the whole city.",
        "Can you send me the report by the end of the day?",
        "The museum exhibition features paintings from the nineteenth century.",
        "They decided to move to a smaller house near the coast.",
        "Reading books every evening helps me relax after work.",
        "The company announced record profits for the third quarter.",
        "My grandmother taught me how to bake apple pie.",
        "The meeting has been rescheduled to next Tuesday afternoon.",
        "A good night of sleep improves memory and concentration.",
        "The river flows gently through the old town center.",
        "Scientists discovered a new species of frog in the rainforest.",
        "He forgot his umbrella and got soaked in the rain.",
        "The students are preparing for their final examinations.",
        "Fresh air and exercise are important for good health.",
        "The bakery on the corner sells wonderful cinnamon rolls.",
    ],
    "de": [
        "Das Wetter ist heute sonnig mit einer leichten Brise aus dem Norden.",
        "Sie ging zum Markt, um frisches Brot und Gemüse zu kaufen.",
        "Unser Team hat das Projekt zwei Tage früher abgeschlossen.",
        "Bitte denken Sie daran, das Licht auszuschalten, wenn Sie den Raum verlassen.",
        "Die Bibliothek öffnet wochentags um neun Uhr morgens.",
        "Er lernt seit drei Jahren Gitarre zu spielen.",
        "Wir sollten das Budget besprechen, bevor wir Entscheidungen treffen.",
        "Der Zug hatte Verspätung wegen starken Schneefalls in den Bergen.",
        "Ich hätte gerne eine Tasse Kaffee mit Milch und ohne Zucker.",
        "Die Kinder spielten im Park, bis die Sonne unterging.",
        "Dieses Restaurant serviert die beste Pasta der ganzen Stadt.",
        "Können Sie mir den Bericht bis zum Ende des Tages schicken?",
        "Die Ausstellung zeigt Gemälde aus dem neunzehnten Jahrhundert.",
        "Sie beschlossen, in ein kleineres Haus an der Küste zu ziehen.",
        "Jeden Abend Bücher zu lesen hilft mir, mich zu entspannen.",
        "Das Unternehmen meldete Rekordgewinne für das dritte Quartal.",
        "Meine Großmutter hat mir beigebracht, wie man Apfelkuchen backt.",
        "Die Besprechung wurde auf nächsten Dienstagnachmittag verschoben.",
        "Guter Schlaf verbessert das Gedächtnis und die Konzentration.",
        "Der Fluss fließt sanft durch die Altstadt.",
        "Wissenschaftler entdeckten eine neue Froschart im Regenwald.",
        "Er vergaß seinen Regenschirm und wurde vom Regen durchnässt.",
        "Die Studenten bereiten sich auf ihre Abschlussprüfungen vor.",
        "Frische Luft und Bewegung sind wichtig für die Gesundheit.",
        "Die Bäckerei an der Ecke verkauft wunderbare Zimtschnecken.",
    ],
    "fr": [
        "Le temps est ensoleillé aujourd'hui avec une légère brise du nord.",
        "Elle est allée au marché acheter du pain frais et des légumes.",
        "Notre équipe a terminé le projet deux jours avant la date prévue.",
        "N'oubliez pas d'éteindre la lumière en quittant la pièce.",
        "La bibliothèque ouvre à neuf heures du matin en semaine.",
        "Il apprend à jouer de la guitare depuis trois ans.",
        "Nous devrions discuter du budget avant de prendre des décisions.",
        "Le train a été retardé à cause de fortes chutes de neige en montagne.",
        "Je voudrais une tasse de café avec du lait et sans sucre.",
        "Les enfants ont joué dans le parc jusqu'au coucher du soleil.",
        "Ce restaurant sert les meilleures pâtes de toute la ville.",
        "Pouvez-vous m'envoyer le rapport avant la fin de la journée ?",
        "L'exposition présente des peintures du dix-neuvième siècle.",
        "Ils ont décidé de déménager dans une maison plus petite près de la côte.",
        "Lire des livres chaque soir m'aide à me détendre après le travail.",
        "L'entreprise a annoncé des bénéfices records pour le troisième trimestre.",
        "Ma grand-mère m'a appris à faire la tarte aux pommes.",
        "La réunion a été reportée à mardi après-midi prochain.",
        "Une bonne nuit de sommeil améliore la mémoire et la concentration.",
        "La rivière coule doucement à travers le centre de la vieille ville.",
        "Des scientifiques ont découvert une nouvelle espèce de grenouille.",
        "Il a oublié son parapluie et a été trempé par la pluie.",
        "Les étudiants se préparent pour leurs examens finaux.",
        "L'air frais et l'exercice sont importants pour la santé.",
        "La boulangerie du coin vend de merveilleux pains à la cannelle.",
    ],
    "es": [
        "El tiempo hoy está soleado con una brisa ligera del norte.",
        "Ella fue al mercado a comprar pan fresco y verduras.",
        "Nuestro equipo terminó el proyecto dos días antes de lo previsto.",
        "Por favor recuerda apagar las luces cuando salgas de la habitación.",
        "La biblioteca abre a las nueve de la mañana entre semana.",
        "Él lleva tres años aprendiendo a tocar la guitarra.",
        "Deberíamos discutir el presupuesto antes de tomar decisiones.",
        "El tren se retrasó por las fuertes nevadas en las montañas.",
        "Me gustaría una taza de café con leche y sin azúcar.",
        "Los niños jugaron en el parque hasta que se puso el sol.",
        "Este restaurante sirve la mejor pasta de toda la ciudad.",
        "¿Puedes enviarme el informe antes de que termine el día?",
        "La exposición presenta pinturas del siglo diecinueve.",
        "Decidieron mudarse a una casa más pequeña cerca de la costa.",
        "Leer libros cada noche me ayuda a relajarme después del trabajo.",
        "La empresa anunció ganancias récord para el tercer trimestre.",
        "Mi abuela me enseñó a hacer tarta de manzana.",
        "La reunión se ha pospuesto para el próximo martes por la tarde.",
        "Dormir bien mejora la memoria y la concentración.",
        "El río fluye suavemente por el centro del casco antiguo.",
        "Los científicos descubrieron una nueva especie de rana en la selva.",
        "Olvidó su paraguas y se empapó con la lluvia.",
        "Los estudiantes se preparan para sus exámenes finales.",
        "El aire fresco y el ejercicio son importantes para la salud.",
        "La panadería de la esquina vende unos rollos de canela maravillosos.",
    ],
}

LANGS: tuple[str, ...] = tuple(sorted(SENTENCES))  # ("de", "en", "es", "fr")

# Small per-language stopword sets; the heuristic stopword rule uses the
# union so it stays language-independent (and SQL-expressible).
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
           "that", "for", "on", "with", "as", "was", "at", "by", "be"],
    "de": ["der", "die", "das", "und", "oder", "zu", "in", "ist", "es",
           "für", "auf", "mit", "als", "war", "bei", "ein", "eine", "den"],
    "fr": ["le", "la", "les", "un", "une", "et", "ou", "de", "à", "en",
           "est", "il", "elle", "que", "pour", "sur", "avec", "dans"],
    "es": ["el", "la", "los", "las", "un", "una", "y", "o", "de", "a",
           "en", "es", "que", "para", "sobre", "con", "por", "del"],
}

STOPWORDS_ALL: list[str] = sorted({w for ws in STOPWORDS.values() for w in ws})

# Deterministic fake toxic lexicon (invented words — the scrub operator is
# about the plumbing, not a real lexicon).
TOXIC_TERMS: list[str] = ["frakk", "glorp", "smegville", "zintak"]

# Junk/boilerplate pools for synth anomaly injection.
BOILERPLATE: list[str] = [
    "click here subscribe now click here subscribe now click here subscribe now",
    "lorem ipsum dolor sit amet lorem ipsum dolor sit amet lorem ipsum",
    "terms and conditions apply terms and conditions apply terms and conditions apply",
]
SYMBOL_SOUP: list[str] = [
    "@@@ ### $$$ %%% ^^^ &&& *** ((( ))) !!! ??? ;;; :::",
    "<<<>>> |||| ==== ++++ ~~~~ ```` ^^^^ %%%% &&&&",
]

# Labeled LOW-QUALITY pool for the learned quality classifier
# (models/quality.py) — the CCNet/fastText-supervised pattern trained
# from-scratch on embedded data: positives are the natural SENTENCES
# above, negatives are the web-junk modes real curation pipelines gate
# out (SEO keyword stuffing, navigation chrome, listicle spam, cookie
# banners, scraped-markup soup, repeated boilerplate, symbol noise).
QUALITY_NEGATIVES: list[str] = BOILERPLATE + SYMBOL_SOUP + [
    "buy now cheap viagra casino poker free spins bonus code deposit now",
    "home | about | contact | privacy | terms | sitemap | login | register",
    "click here click here click here best deals best deals best deals",
    "SEO services cheap backlinks buy followers instant traffic guaranteed",
    "cookie policy accept all cookies we use cookies manage preferences ok",
    "top 10 amazing tricks doctors hate number 7 will shock you click now",
    "aaaaaa bbbbbb cccccc dddddd eeeeee ffffff gggggg hhhhhh iiiiii jjjjjj",
    "404 not found page not found error 404 the page you requested was not",
    "download now free download fast download mirror 1 mirror 2 mirror 3",
    "qwertyuiop asdfghjkl zxcvbnm qwerty asdf zxcv qaz wsx edc rfv tgb yhn",
    "win win win jackpot jackpot slots slots slots bonus bonus free free",
    "<div><span><a href= click </a></span></div> <br> <br> <br> &nbsp;",
    "unsubscribe from this mailing list update your preferences view in browser",
    "limited time offer act now dont miss out exclusive deal expires soon buy",
    "xX_420_Xx gg ez noob lol lol lol rofl lmao xd xd xd pwned rekt gg gg",
    "1 2 3 4 5 6 7 8 9 10 11 12 13 14 15 16 17 18 19 20 next page last page",
    "copyright all rights reserved reproduction prohibited legal notice dmca",
    "follow us on facebook twitter instagram youtube tiktok pinterest linkedin",
    "zzzz yyyy xxxx wwww vvvv uuuu tttt ssss rrrr qqqq pppp oooo nnnn mmmm",
    "%%promo%%code%%save%%big%%deal%%sale%%discount%%coupon%%voucher%%offer",
]
