#!/usr/bin/env python
"""Freeze the FOURTH held-out corpus (fixtures/heldout_prose4.jsonl) —
ADVERSARIAL registers (r6 VERDICT Next #3).

Corpora #1-#3 measured the grammar on well-formed written prose and all
three reached the reference's own extraction ceiling, so this corpus
deliberately targets the registers where a rule grammar is MOST likely
to break: (a) informal dialogue with disfluencies, fillers, false starts
and fragments, (b) headlines and headline-style verbless fragments,
(c) question-heavy text (wh-, yes/no-, tag- and echo-questions), and
(d) long multi-clause sentences with stacked subordination and
coordination.

Provenance: every paragraph below was hand-composed for this corpus in a
single pass, WITHOUT consulting the parser, the lexicon, or the
transcript generator, and the file is committed before the first
coverage measurement — unscreened by construction, the same protocol as
corpora #1-#3 (FIXTURES.md).  The grammar may afterwards be grown
against the failures this corpus exposes; the corpus itself is frozen
and never edited to flatter the parser.

Output format matches fixtures/heldout_prose.jsonl: one JSON object per
line, {"doc_texts": [paragraph]}.
"""
import json
import os

PARAGRAPHS = [
    # --- dialogue / informal speech with disfluencies -------------------------
    "So, um, I was going to call you yesterday, but then the thing with the car happened. You know how it is. Anyway, the mechanic says it needs a new alternator, which, I mean, of course it does. He can fit us in on Thursday.",
    "Honestly? I don't even know where to start. The meeting ran long, the printer jammed, and then Karen - you remember Karen - she just walks in with donuts like nothing happened. I couldn't even be mad.",
    "He was like, there's no way that's the right address, and I was like, it's literally on the invitation. We drove around the block twice. Turns out the house was behind the other house. Who builds a house behind a house?",
    "Yeah, no, I get it. It's just, well, it's a lot of money for a couch. A really nice couch, don't get me wrong. But still. A couch.",
    "Okay so picture this. It's raining, right, and the tent has exactly one pole left. Dave's holding the flashlight in his teeth. And then the raccoon shows up. I'm not even joking.",
    "I mean, she tried. She really did. The cake just, sort of, collapsed in the middle? We ate it anyway. With spoons. It was actually pretty good.",
    "Hang on, back up. You sold the boat? The boat we literally just fixed? Wow. Okay. I need a minute.",
    "It's not that I don't want to go. It's more, like, the timing. The kids have that thing Saturday, and then Sunday there's the other thing. Maybe the weekend after? Don't hate me.",
    "So the doctor goes, have you been stretching, and I go, define stretching. She didn't laugh. Anyway I have to do these exercises now, twice a day, with a rubber band. A rubber band!",
    "Um, quick question. The wifi password, is it the one on the fridge or the one on the router? Because neither works. I've tried both like ten times. Also your cat is on my keyboard.",
    "No no no, listen. The recipe says simmer, not boil. There's a difference, apparently. A big one. Ask my smoke detector.",
    "We got there at, what, six? Six thirty? The line was already around the block. Some guy in front of us had been camping there since noon. For a sandwich. I mean, a famous sandwich, but come on.",
    "You know what, forget the movie. Let's just, I don't know, walk around downtown or something. Grab a coffee maybe. It's too nice out to sit in the dark.",
    "She texted me back right away, which, okay, good sign, right? But it was just a thumbs up. One thumbs up. What am I supposed to do with that?",
    "Well, the short version is, the ladder slipped. The long version involves a wasp. I'm fine, mostly. The gutter is not.",
    "I keep telling him, you can't just plant tomatoes in January, and he keeps saying, greenhouse, greenhouse. Fine. We'll see whose tomatoes win in July. Spoiler: mine.",
    "Oh man, the game last night? Brutal. We had it, we absolutely had it, and then the last two minutes happened. I turned the TV off. Couldn't watch.",
    "So apparently, and I'm just hearing this now, the flight got moved up two hours. Two hours! Who does that? We need to leave, like, now. Where are my keys?",
    "It's a long story. Actually no, it's a short story, it's just embarrassing. I locked myself out. Again. The neighbor has a key now, which tells you everything.",
    "Right, so, budget meeting. I'll be honest, half of it went over my head. Something about rollover funds? The gist is, we can't order the new chairs. The old chairs live another year.",
    "Hey, um, weird question, but did you borrow my drill? Not accusing, just asking. It's not in the garage and dad swears he didn't touch it. He definitely touched it.",
    "And then, get this, the bus just doesn't come. Not late. Just, doesn't come. Apparently Tuesdays it takes the other route now. Would've been nice to know, you know, ever.",
    "I tried that new place on Fifth. The one with the neon sign? Eh. The fries were good. Everything else was kind of whatever. Overpriced whatever.",
    "Look, all I'm saying is, if the instructions need a video, a diagram, and a helpline, maybe the bookshelf is the problem. Not me. The bookshelf.",
    "She's doing great, thanks for asking. Walking already, if you can believe it. Eleven months! We baby-proofed everything and she still found the one drawer we missed. Of course she did.",
    "Okay okay okay, final answer. We paint the kitchen the green one, the hallway stays white, and we never speak of the yellow again. Deal? Deal. Hand me the roller.",
    # --- headlines / verbless fragments ----------------------------------------
    "Flood waters recede; cleanup begins. Three shelters still open downtown. Mayor: federal aid request filed Monday. Schools closed through Wednesday.",
    "Local bakery wins statewide prize. Secret ingredient? Cardamom, says owner. Lines out the door since Tuesday. Expansion plans on hold for now.",
    "Storm warning for the coast tonight. Gusts to sixty expected after dark. Ferries cancelled. Campgrounds evacuated as a precaution.",
    "New bridge opens ahead of schedule. Under budget, too - a first for the county. Ribbon cutting at noon Saturday. Fireworks to follow.",
    "Rare owl spotted in city park. Birders arriving from three states. Trails near the north pond temporarily closed. Photos on page six.",
    "Council votes tonight on parking changes. Two hours free downtown, then a dollar an hour. Merchants split on the plan. Public comment at seven.",
    "Factory shifts to four-day week. No layoffs, says management. Union cautiously optimistic. Output targets unchanged.",
    "High school robotics team headed to nationals. Fundraiser Friday at the gym. Spaghetti dinner, ten dollars a plate. All proceeds to travel costs.",
    "Drought conditions worsen upstate. Reservoir at forty percent. Watering restrictions likely by August. Farmers eyeing the long-range forecast.",
    "Museum acquires lighthouse keeper's journals. Forty years of daily entries. Exhibit planned for spring. Conservation work underway now.",
    "Transit strike averted at the last hour. Buses running normally this morning. Three-year contract, modest raises. Both sides claiming victory.",
    "Fire at the old cannery contained. No injuries reported. Cause under investigation. Building slated for demolition since 2019.",
    "Library announces summer reading program. Prizes for all ages. Sign-ups open Monday. Last year: two thousand participants.",
    "Clinic adds weekend hours. Walk-ins welcome Saturdays. Flu shots free through October. Appointments still recommended for everything else.",
    "Historic carousel restored at last. Four years of volunteer weekends. First rides Memorial Day. Tickets: two dollars, same as 1962.",
    "Power restored to east side neighborhoods. Crews worked through the night. Downed lines on Maple cleared by dawn. Cooling center closing at noon.",
    "Farmers market moves indoors for winter. Same vendors, new hall. Parking behind the armory. Saturdays only, nine to one.",
    "Shipyard lands navy contract. Two hundred jobs over five years. Apprenticeship program doubling. Housing market already reacting.",
    "Youth orchestra tour cancelled. Funding shortfall cited. Refunds by end of month. Director: we will be back next year.",
    "Bear cub rescued from culvert. Mother waiting nearby, wardens say. Reunion successful. Road reopened by evening.",
    "Vote recount confirms narrow win. Margin: nineteen votes. Challenger concedes. Turnout a record for a midterm.",
    "Bridge inspection finds minor cracks. Repairs scheduled for fall. One lane closures expected. Engineers: no safety risk to drivers.",
    "Community garden plots sold out again. Waiting list tops one hundred. Expansion eyed for the vacant lot on Birch. Soil testing first, city says.",
    "Marathon route changed this year. Hill at mile nineteen dropped. Runners rejoice. Purists grumble.",
    "Night market returns downtown. Food stalls, live music, lantern walk. First Friday of every month through September. Free admission.",
    "Whale sighting delays ferry twice. Passengers not complaining. Photos flood social media. Biologists: a good sign for the strait.",
    # --- question-heavy text -----------------------------------------------------
    "Where does the time actually go? One minute the garden is seedlings, and the next it needs mowing twice a week. Did anyone ask the grass to grow this fast? The calendar says June, but how?",
    "Who left the gate open? The goats are in the herb bed again. How do they always know when the basil is ready? And why do they never eat the weeds?",
    "What makes a house a home? Is it the furniture, or the people, or the smell of something in the oven? Can a rented room feel like home? The poets say yes. The movers say it depends on the stairs.",
    "Why do we keep the broken clock? It hasn't ticked since the nineties. Is it the brass case, or grandpa's initials on the back? Some questions answer themselves, don't they?",
    "Have you ever watched a heron fish? How long can a bird actually stand that still? Ten minutes? Twenty? The patience puts every angler on the pier to shame.",
    "Is the sourdough starter still alive? When did anyone last feed it? Does a week in the fridge count as neglect or as rest? The smell will tell us, won't it?",
    "What time does the tide turn tomorrow? Should we launch from the north ramp or the cove? Who has the good map, the one with the depth lines? And whose turn is it to bring the coffee?",
    "Why does the printer work for everyone except me? Do machines hold grudges? I replaced its toner, cleared its jams, spoke kindly to it. What more does it want?",
    "Remember the treehouse? Who drew the plans on the back of a homework sheet? Was it your idea or mine to add the rope ladder? Did dad ever find out about the missing fence boards?",
    "How does the bakery sell out by nine? Do people line up at dawn? Is the rye really that good? Fine. Tomorrow, we find out. Who's setting the alarm?",
    "Can a town be too quiet? The visitors ask how we stand the silence. We ask how they stand the noise. Which question is the better one?",
    "What did the inspector actually say? Is the wiring a problem or just old? Do we fix it now or budget for spring? And is the roof next, or am I borrowing trouble?",
    "Whose bright idea was the surprise party? Did nobody check the calendar? How do you surprise a man on the one weekend he visits his sister? Where do we put forty cupcakes until Tuesday?",
    "Does the old orchard still bear fruit? The trees went unpruned for a decade, didn't they? Yet every October the deer gather there. What do they know that we forgot?",
    "Why is the lake called Second Lake? Where exactly is First Lake? The oldest map in the library shows only one lake. Did someone count wrong, or did a lake go missing?",
    "Are we out of the good tea again? Who finishes a tin and puts it back on the shelf? Is that a crime in some countries? It should be, shouldn't it?",
    "How early is too early to mow? Seven? Eight? The neighbor clearly has opinions, doesn't he? Perhaps the rake this morning, the mower after lunch.",
    "What should we name the boat? Every good pun is taken, isn't it? Something from a book, maybe? Or do boats name themselves, the way cats do, eventually?",
    "Did the seeds we saved come true? The squash looks right, but what about the melons? Wasn't there a stray pumpkin in that corner last year? Cross-pollination keeps its own records, doesn't it?",
    "Who taught grandma to play poker? Why did nobody warn us? She took the whole jar of buttons in an hour. Should we be proud or concerned?",
    "Is it too late to learn the fiddle? The teacher says no. The neighbors may say otherwise, mightn't they? How thick are these walls, really?",
    "Where do the swallows go in winter? The almanac says south, but how far south? Do the same birds return to the same barn? The banding study should tell us by spring, shouldn't it?",
    "Why does the attic door open on humid days? Is it the wood swelling, or the hinge, or something we'd rather not name? The cat won't go up there. What does the cat know?",
    "What belongs in a time capsule? A newspaper, obviously, but what else? A phone that won't charge in fifty years? Seeds? Whose handwriting goes on the letter?",
    "How many lighthouses are left on this coast? Which ones still light? Can you rent the keeper's cottage at the point, or did that end with the storm? Who would we even ask?",
    "Did anyone water the ferns while we were away? Why are they crispy? How does a plant dramatize neglect so effectively? Can this one be saved, or do we start over?",
    # --- long multi-clause sentences ----------------------------------------------
    "Although the forecast promised a dry weekend, and although the almanac, which my grandfather trusted more than any meteorologist, agreed with it, the rain began before dawn on Saturday and continued, with only brief and taunting interruptions, until the festival's last unsold raffle ticket had wilted in its roll.",
    "The committee agreed that the bridge needed repairs, that the repairs would require a bond, and that the bond would require a vote, but because no member wished to schedule a vote in an election year, the bridge, the repairs, the bond, and the vote all waited for a calmer calendar.",
    "When the orchard froze in April, after the earliest bloom anyone could remember, the growers who had heated their rows with smudge pots saved a partial crop, while those who had trusted the warm March, as most of us did, spent the summer explaining to customers why the roadside stands stood empty.",
    "She wrote the first chapter on the night train between two cities whose names she later gave to her characters, and although the notebook was lost in a station cafe and recovered a week afterward by a porter who read none of it, she always claimed the book had been improved by its travels.",
    "If the river rises past the second marker, which it has done only four times since the dam was finished, the road crew closes the low crossing, the school reroutes its buses along the ridge, and the ferry, which is older than the dam and fussier than both, stays tied to its dock until the gauge forgives us.",
    "The shop survived the highway bypass that emptied the main street, the chain store that undercut its prices for six loud years, and the fire that took its back room, because the owner, who had learned the trade from a man who had learned it from his mother, kept fixing what other shops had decided was cheaper to replace.",
    "Because the choir's bus broke down outside a town none of them had visited, and because the only mechanic was also the organist at the church across the square, the concert that should have happened at the county hall happened instead under a tin roof for an audience of thirty, and those who were there still describe it to those who were not.",
    "By the time the census taker reached the last farm on the list, which sat at the end of a road the county had twice proposed to pave and twice forgotten, the family had already answered the same questions for a surveyor, a historian, and a lost cyclist, so they invited her in, fed her supper, and answered everything once more.",
    "The telescope, which the club had bought secondhand from a university that was upgrading, and which had crossed the country in a trailer behind a borrowed truck, revealed on its first clear night exactly what the catalog had promised and what none of the members, who had waited years, was in any way prepared for.",
    "Whenever the tide dropped below the old pilings, and the flats opened gray and shining to the horizon, the clammers walked out with their rakes and buckets while the gulls, which knew the schedule better than any of us, assembled in committees to supervise and to steal.",
    "He had promised his daughter that the treehouse would be finished before her birthday, and though the lumber arrived late, the drill died on the second afternoon, and the oak itself seemed to argue with every joist, the last board went down while the cake was still cooling, which is the only deadline that has ever truly mattered to him.",
    "The recipe had traveled from a village none of the family could place on a map, through a war that scattered the cousins across three continents, and into a spiral notebook whose cover was lost before I was born, so when my aunt finally typed it into her computer, misspelling nothing but changing the butter, two grandmothers turned over in their graves and the pastry, everyone agreed, noticed.",
    "Since the library flooded in the spring, the book club has met in the fire hall, where the chairs are harder and the coffee stronger, and although everyone promises to return to the reading room as soon as the carpets are replaced, attendance has doubled, which suggests the books were never entirely the point.",
    "The captain logged that the fog arrived at four, that the horn sounded through the night at intervals of one minute, and that no vessel answered, yet the fishermen on the point, whose memories disagree about everything else, insist to this day that between the horn's calls they heard bells.",
    "Whoever planted the row of sycamores along the east field, whether it was the first owner, who kept no records, or his son, who kept records no one can read, understood that the trees would shade a house that had not yet been built for a family he would never meet, which is as good a definition of faith as the county offers.",
    "Although the manual insisted that assembly required two people, forty minutes, and no tools beyond the included wrench, the bed frame consumed our entire Sunday, three phone calls, a neighbor's socket set, and the last of our patience, and when it finally stood square and solid, neither of us could find the bag of bolts we had, according to the manual, already used.",
    "When the mill closed, the town that had set its clocks by the shift whistle learned to keep other hours, and the building itself, after standing dark through two decades in which every plan for it failed for a different reason, reopened as a school whose students now learn carpentry in the room where their grandparents cut the beams.",
    "If you follow the creek past the second footbridge, where the alders close over the water and the path pretends to end, and if you keep to the left bank though the right looks easier, you will come out at the meadow the maps do not bother with, which is exactly why it remains worth the walk.",
    "The violin had belonged to her teacher, who had carried it out of one country sewn into a coat and into another country strapped beneath a truck, and when she played the slow movement at his memorial, on strings he had taught her to change and to tune, the instrument sounded, as everyone later agreed, like it was answering for him.",
    "Because the power failed during the third inning, and because the backup generator, which the board had voted to service every spring and had serviced never, declined its one invitation to matter, the championship was finished by the headlights of eleven pickup trucks, and no one who stood along that foul line has ever watched a brighter game.",
    "The survey crew found the original boundary stone precisely where the deed from 1831 said it would be, under a cairn at the corner of two stone walls, which settled in one afternoon an argument that three generations of both families had kept alive through fences built, fences moved, and one memorable incident involving a bull.",
    "After the bakery burned, the town that had quarreled all winter about parking, taxes, and the color of the new streetlamps raised the money for the ovens in nine days, and the baker, who had planned to retire quietly in the fall, stayed eleven more years, because a debt like that, she said, is paid in bread.",
    "While the rest of the delegation toured the capital, the junior clerk, whose only instruction had been to guard the luggage and say nothing, fell into conversation with a porter about canal locks, learned of a flaw in the design they had traveled to purchase, and thereby saved the ministry a sum that no one ever calculated in his presence or credited to his name.",
    "The storm that the radio had promised for the coast came inland instead, took the oldest elm on the green, spared the gazebo beneath it by a distance the carpenters still discuss, and left behind a silence so complete that the whole neighborhood, which had slept through the wind, woke at once to the absence of it.",
    "Though the letter had been addressed plainly, stamped correctly, and mailed from the same post office that had handled the family's correspondence for sixty years, it arrived after a detour of four decades, delivered by a postmaster who had found it behind a sorting cabinet and who stood on the porch while it was opened, because some deliveries, he explained, you see through to the end.",
    "Every autumn the club debates moving the regatta to a warmer month, and every autumn the motion fails by the same two votes, because the founders wrote into the bylaws, with a foresight that borders on mischief, that any change of date requires the consent of the two oldest members, who are, respectively, the woman who won the first race in a sleet storm and the man who finished second and married her.",
]


def main():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = os.path.join(repo, "fixtures", "heldout_prose4.jsonl")
    with open(out, "w") as f:
        for p in PARAGRAPHS:
            f.write(json.dumps({"doc_texts": [p]}) + "\n")
    print(f"wrote {len(PARAGRAPHS)} paragraphs to {out}")


if __name__ == "__main__":
    main()
