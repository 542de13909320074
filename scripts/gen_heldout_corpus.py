#!/usr/bin/env python
"""Freeze the held-out prose corpus (fixtures/heldout_prose.jsonl).

Provenance: every paragraph below was hand-composed for this corpus in a
single pass, across twelve registers of ordinary written English
(narrative, news, technical docs, dialogue, instructions, reviews, travel,
sports, weather, memos, popular science, history).  The text was written
WITHOUT consulting the parser, the lexicon, or the transcript generator,
and the file was committed before the first coverage measurement — the
corpus is unscreened by construction (VERDICT r4 Next #1).  The grammar is
grown against the failures this corpus exposes; the corpus itself is
frozen and never edited to flatter the parser.

Output format matches fixtures/oog_docs.jsonl: one JSON object per line,
{"doc_texts": [paragraph]}.
"""
import json
import os

PARAGRAPHS = [
    # --- narrative ---------------------------------------------------------
    "The lamp flickered twice and went out. Marta waited in the dark until her eyes adjusted, then she crossed the room and opened the shutters. Rain had fallen all night, and the street below shone like a river. She dressed quickly because the train left at seven.",
    "Nobody remembered who had built the wall at the end of the orchard. It was older than the house, older than the road, and the stones had settled into one another like old friends. Tomas climbed it anyway. From the top he saw smoke rising beyond the hills.",
    "The letter arrived on a Tuesday. Helen read it twice at the kitchen table, folded it, and slid it under the fruit bowl. She said nothing at dinner. Later, while the others slept, she packed a small bag and counted the money she had saved.",
    "A fox crossed the yard at dawn. The dog barked once and then fell silent, as if it had decided the matter was not worth the trouble. Frost covered the grass. Inside, the kettle began to whistle, and the day started like every other day.",
    "He had promised his brother that he would return before the harvest. The roads were slow and the bridges were crowded, but he walked on. At night he slept in barns and under hedges. When he finally reached the farm, the fields were already bare.",
    "The old clock in the hallway had stopped at ten past three. Nobody wound it anymore. Dust gathered on its face, and the pendulum hung still behind the glass. Visitors sometimes asked about it, and grandmother always changed the subject.",
    "Snow began to fall as the ferry pulled away from the dock. Ana stood at the rail and watched the town shrink until the lights blurred together. A stranger offered her coffee from a thermos. She accepted it, and they talked until the far shore appeared.",
    "The boy kept a jar of river stones under his bed. Each stone had a name and a story. His sister laughed at him, but she listened anyway when he explained them. Years later she found the jar in a box and could not bring herself to throw it away.",
    "It was the hottest summer anyone could remember. The pond shrank to a circle of cracked mud, and the cattle stood in whatever shade they could find. Every evening the farmers studied the sky. The clouds gathered, promised everything, and delivered nothing.",
    "Grandfather told the same story every winter. A wolf had followed him through the forest for three days, he said, never closer, never farther. We knew the ending by heart. Still, we leaned in when the wind rattled the windows, and he lowered his voice.",
    "The theater had been closed for a decade, but the posters still clung to the wall outside. Rosa pressed her face to the glass doors. Rows of seats waited in the gloom like an audience that had never gone home. She tried the handle. It turned.",
    "They buried the time capsule beside the flagpole on the last day of school. Each child added one object. Daniel gave up his best marble, which surprised everyone. The principal sealed the lid and promised they would open it in fifty years.",
    "The tide went out farther than usual that morning. Shells and green glass lay scattered across the wet sand. An old man with a metal detector worked the beach in slow lines. He nodded to us as we passed, and the gulls screamed overhead.",
    "Her suitcase was heavier on the way back. Books, mostly, and a brass bell she had bought in a market for no reason she could explain. The customs officer lifted the bell, rang it once, and smiled. She carried that sound home with her.",
    "The power failed during the storm, so we lit candles and played cards at the kitchen table. The house creaked around us. My father told jokes that were older than the house. We lost track of the score, and nobody minded.",
    # --- news ---------------------------------------------------------------
    "The city council approved the new transit plan on Thursday after a long public hearing. The plan adds three bus routes and extends service hours until midnight. Officials expect construction to begin in the spring. Several residents praised the decision, while shop owners near the depot raised concerns about parking.",
    "A water main burst on Harbor Street early Monday, flooding two blocks and closing the intersection for most of the day. Crews repaired the pipe by evening. The utility said the main was installed in 1962 and had been scheduled for replacement next year. No injuries were reported.",
    "The regional museum unveiled a restored mural in its east wing yesterday. Conservators worked on the painting for two years, removing layers of varnish and soot. The mural depicts the founding of the town. Admission to the exhibit is free through the end of the month.",
    "Firefighters contained a brush fire near the reservoir on Saturday afternoon. The fire burned about forty acres before crews stopped its spread. Investigators believe a discarded cigarette started the blaze. The trail along the ridge will remain closed while the slope is assessed.",
    "The school board voted to delay the start of classes by one week after inspections found mold in two buildings. Contractors will clean the ventilation systems over the break. Parents received notice by email on Friday. The district will publish a revised calendar on its website.",
    "Local growers reported a strong apple harvest this year despite the dry summer. Orchards opened for picking last weekend, and lines formed before the gates opened. Prices remain close to last year's levels. The festival returns in October with cider pressing and a pie contest.",
    "The port authority announced a pilot program to electrify two of its cranes. The upgrade should cut diesel use at the terminal by a fifth. Funding comes from a state grant and the authority's capital budget. A spokesperson said the first crane will switch over in March.",
    "Voters will decide next month whether to fund a new library branch on the north side. The measure would raise property taxes by a small margin for ten years. Supporters point to crowded reading rooms and long waits for computers. Opponents argue the city should renovate the existing branch instead.",
    "A cargo ship lost power outside the harbor on Wednesday and drifted for nearly an hour before tugs reached it. The vessel anchored safely and repairs began at once. The coast guard opened an inquiry. Shipping schedules saw minor delays through the evening.",
    "The hospital opened its expanded emergency department on Monday. The new wing doubles the number of treatment rooms and adds a separate entrance for ambulances. Staff trained in the space for three weeks before the opening. Administrators say wait times should drop noticeably.",
    "Researchers at the field station tagged the first returning salmon of the season on Tuesday. The run arrived earlier than last year. Biologists credit cooler water and the removal of a derelict dam downstream. Counts will continue through November.",
    "The bakery on Mill Street will close after thirty years, its owners announced in a note taped to the door. Rising rent and the cost of flour drove the decision. Regulars left flowers and cards on the windowsill. The ovens will be sold at auction next month.",
    # --- technical documentation --------------------------------------------
    "The scheduler assigns each task to the first available worker. If no worker responds within the timeout, the task returns to the queue and its retry counter increases. After three failed attempts, the task moves to the dead-letter queue. Operators can replay dead letters from the dashboard.",
    "Configuration values load in three layers. Defaults ship with the binary, a site file overrides the defaults, and environment variables override everything else. The service logs the final merged configuration at startup. Secrets never appear in the log output.",
    "The client library retries idempotent requests automatically. Backoff starts at one hundred milliseconds and doubles on each attempt, up to a ceiling of ten seconds. A jitter term prevents synchronized retries across clients. Non-idempotent requests fail fast and surface the error to the caller.",
    "Each snapshot contains a manifest, a set of data blocks, and a checksum file. The restore tool verifies every checksum before it writes a single byte. A corrupted block aborts the restore and leaves the target directory untouched. Partial restores are not supported by design.",
    "The cache evicts entries by last access time. A background thread scans the table every minute and removes entries older than the configured ceiling. Hot entries refresh their timestamp on every read. The eviction pass holds the lock briefly, so readers rarely block.",
    "To upgrade a node, drain it first. The drain command stops new assignments and waits for running jobs to finish. Once the node reports idle, apply the package and restart the agent. The node rejoins the pool automatically after its health checks pass.",
    "The parser reads the header before it allocates any buffers. A malformed header terminates the connection immediately. Valid frames append to a ring buffer, and a separate thread drains the buffer in order. Back-pressure propagates to the sender when the buffer fills.",
    "Metrics export over a single endpoint in a plain text format. Counters only increase, gauges move in both directions, and histograms bucket their observations. The agent scrapes the endpoint every fifteen seconds. A stale marker flags series that have stopped updating.",
    "The migration runs in two phases. The first phase copies rows in batches and records a watermark after each batch. The second phase replays changes that arrived during the copy. A final swap renames the tables inside one transaction, so readers never observe a mixed state.",
    "Log lines follow a fixed shape: timestamp, level, component, message, and an optional field map. The shipper parses the shape once and forwards structured records. Unparseable lines still ship, tagged as raw. Nothing is dropped silently.",
    "The sandbox denies network access by default. A manifest grants specific hosts and ports, and the runtime enforces the grants at the socket layer. Denied calls return a standard error code. An audit channel records every denial with the caller's identity.",
    "Builds are reproducible by construction. The toolchain pins every dependency by hash, timestamps are zeroed, and the archive format sorts its entries. Two machines with the same inputs produce byte-identical artifacts. The release pipeline verifies this property on every tag.",
    # --- dialogue / conversational -------------------------------------------
    "I called the landlord about the heater again. He says the part is on order. That is the same thing he said in January. I told him we would deduct the repair from the rent if it is not fixed by Friday. He did not like that.",
    "You should have seen the line at the bakery this morning. It went around the corner. I waited twenty minutes and they still had the rye bread, so it was worth it. The new girl at the counter remembered my order.",
    "We looked at the apartment on Elm Street yesterday. The kitchen is small but the light is wonderful. The landlord seems decent. There is a park across the road, and the train is a ten minute walk. We are going to sleep on it.",
    "My sister finally finished her degree. The ceremony is next month, and the whole family is driving up. Mom already bought a dress. Dad keeps pretending it is not a big deal, but he booked the hotel three weeks ago.",
    "The mechanic says the noise is the wheel bearing, not the brakes. That is the good news. The bad news is the price. He can do it Thursday if I leave the car overnight. I will need a ride to work.",
    "Honestly, the meeting could have been an email. We spent an hour on the logo and five minutes on the budget. Nobody asked about the deadline. I raised it at the end, and everyone looked at their laptops.",
    "The kids set up a lemonade stand on the corner. They made eleven dollars and spent nine of it on stickers. The neighbor bought three cups and tipped them a dollar each. They are already planning a second location.",
    "I tried that recipe you sent. The dough would not rise the first time because the yeast was dead. The second batch worked beautifully. The crust cracked when it cooled, just like the picture. I am making two loaves this weekend.",
    "He says the fish in that river are enormous. I have my doubts. Every photo he shows me is blurry, and the fish is always at arm's length toward the camera. Still, he tells it well, and the coffee at his cabin is good.",
    "The power went out during the match last night. We listened to the last ten minutes on an old radio in the garage. The commentator lost his voice when the goal went in. It was better than television, honestly.",
    # --- instructions / how-to ----------------------------------------------
    "Preheat the oven to two hundred degrees. Rinse the lentils and drain them well. Soften the onions in olive oil over low heat, then add the garlic and cumin. Stir in the lentils, cover them with stock, and simmer for twenty-five minutes. Season at the end, not the beginning.",
    "Before you paint, wash the wall and let it dry completely. Fill any holes with spackle and sand the patches smooth. Tape the trim and lay a drop cloth. Cut in the edges with a brush first, then roll the large areas in overlapping strokes.",
    "Check the tire pressure when the tires are cold. Remove the valve cap and press the gauge straight onto the stem. Compare the reading with the figure inside the door jamb, not the number on the tire itself. Add air in short bursts and measure again.",
    "Divide the perennials in early autumn. Water the bed the day before, then lift each clump with a fork, keeping the root ball intact. Pull the crowns apart by hand or cut them with a clean spade. Replant the divisions at the original depth and water them in.",
    "To descale the kettle, fill it halfway with equal parts water and white vinegar. Let it sit for an hour, then boil it once and pour it out. Rinse twice with fresh water. Boil and discard one more fill before you make tea.",
    "Back up the old phone before you switch. Charge both devices above half. Place them side by side and follow the transfer prompts. Keep both phones unlocked during the copy. Sign in to your accounts on the new phone and verify the photos arrived before you wipe the old one.",
    "Knead the dough until it springs back when you press it. Shape it into a ball and set it in an oiled bowl. Cover the bowl with a damp towel and leave it somewhere warm. It should double in about ninety minutes. Punch it down gently before shaping.",
    "Sharpen the blade at the angle the factory set, usually around twenty degrees. Draw the edge across the stone in smooth, even passes. Alternate sides every few strokes. Finish on the fine grit and strop the edge on leather. Test it on paper, not on your thumb.",
    "Label the breaker panel before trouble arrives. Turn on every light in the house. Switch off one breaker at a time and note which rooms went dark. Write the results on the panel door. Your future self will thank you during the next outage.",
    "Pack the heaviest items at the bottom of the box and the fragile ones on top. Wrap glasses individually and fill the gaps with crumpled paper. Tape the seams twice. Write the destination room on two sides of every box, not on the lid.",
    # --- reviews -------------------------------------------------------------
    "The headphones sound better than their price suggests. The bass is controlled, the mids are clear, and the highs never turn harsh. Battery life matched the claim on the box. The case feels cheap, and the app is unnecessary. I recommend them anyway.",
    "We stayed three nights in the corner room. The bed was firm, the shower was hot, and the street noise faded by eleven. Breakfast repeated itself by day two. The staff remembered our names, which counts for a lot. We would return in the off season.",
    "This novel starts slowly and trusts its reader. The middle section, told through letters, is the strongest writing the author has published. The ending arrives too quickly and leaves one thread hanging. I finished it in two sittings and thought about it for a week.",
    "The restaurant seats about thirty people and refuses reservations. We waited forty minutes on a Friday. The noodles justified the wait. Portions are generous, the broth is deep and honest, and the pickles are made in house. Bring cash, because the card machine is temperamental.",
    "The vacuum is light enough to carry upstairs with one hand. It swallows pet hair without complaint. The bin is small, so you empty it often. The attachments click in firmly and do not rattle. After six months, the battery still holds a full charge.",
    "The museum's new wing is worth the detour alone. The rooms flow naturally, and the lighting flatters the older canvases. Labels are short and actually informative. The cafe overcharges for average coffee. Skip it and walk to the square instead.",
    "I bought this jacket for a rainy climate, and it has earned its keep. The seams have never leaked. The hood adjusts with one hand. The zipper sticks occasionally at the hem. After a full year of commuting, the fabric shows no wear at the shoulders.",
    "The board game promises an hour and takes two. The rulebook answers most questions, though we argued about the trading phase. Turns move quickly once everyone learns the icons. It rewards planning without punishing newcomers. Our copy already shows the good kind of wear.",
    # --- travel --------------------------------------------------------------
    "The bus climbed for an hour before the valley opened below us. Terraced fields stepped down to a green river. We stopped in a village where the bakery sold bread straight from a wood oven. The driver waited while everyone bought a loaf.",
    "Arrive at the market early, before the tour groups. The fish stalls open first, and the auction is worth watching even if you buy nothing. By nine the lanes fill completely. The old quarter behind the market hides the better cafes.",
    "The coastal path runs for twelve miles between the two towns. Most walkers split it at the lighthouse, where a seasonal cafe serves soup and strong tea. The cliffs drop sharply in places, and the wind can surprise you. Check the tide table before you commit to the beach section.",
    "Our train left the border station after midnight. The compartment smelled of oranges and diesel. A conductor checked the tickets twice, apologizing both times. I slept against the window and woke to vineyards in the fog. The city appeared an hour later, all domes and wires.",
    "The island has one road and no traffic lights. Scooters outnumber cars three to one. Ferries arrive twice a day in summer and twice a week in winter. The harbor restaurant posts no menu; you eat whatever the boats brought in. We stayed two extra days.",
    "The old capital rewards slow walking. Courtyards open off the main streets, and most are public even when they look private. Museums close on Mondays, and the cathedral closes for lunch. Climb the bell tower in the late afternoon, when the roofs turn copper.",
    "We rented bicycles at the station and followed the canal north. The path was flat, shaded, and nearly empty on a weekday. Herons stood in the shallows like ornaments. A lock keeper let us watch the gates work. We covered thirty easy kilometers by dinner.",
    "Pack layers for the highlands even in July. The morning started warm and bright, and by noon the rain arrived sideways. The shelters along the trail are sturdy and free. Sign the log book in each one. The rescue service reads them when someone goes missing.",
    # --- sports --------------------------------------------------------------
    "The home side controlled the first half and wasted three clear chances. The visitors scored against the run of play just before the break. The equalizer came from a corner in the seventieth minute, and the stadium found its voice. Both keepers earned their wages in the final ten minutes.",
    "She broke away on the final climb and never looked back. The chasing group hesitated, and the gap grew to forty seconds. Her time at the summit set a new course record. The defending champion finished third and congratulated her at the line.",
    "The rookie pitched six strong innings in his first start. He walked two, struck out seven, and kept the ball down all night. The bullpen made it interesting in the ninth. A diving catch in center field ended the game and started the celebration.",
    "The relay team dropped the baton in the semifinal and still advanced on time. In the final, the exchanges were clean and the anchor leg was untouchable. They won by half a second. The coach called it the best forty-five seconds of his career.",
    "Rain delayed the third set for an hour. When play resumed, the older player's serve deserted him. The challenger broke twice, closing out the match with a drop shot that barely cleared the net. The crowd stood for both men.",
    "The club announced a new manager on Monday, its third in two seasons. He inherits a squad low on confidence and a schedule with no mercy. His first training session ran two hours longer than usual. Supporters are cautiously hopeful, which is their permanent condition.",
    # --- weather / nature -----------------------------------------------------
    "A cold front moves through tonight, and temperatures will drop sharply after midnight. Winds shift to the northwest by morning, gusting along the coast. Showers taper off before dawn. The weekend looks dry and bright, with a hard frost likely in the valleys on Sunday night.",
    "The marsh changes completely in October. The reeds turn the color of brass, and the first migrating geese arrive in loud, ragged lines. Dragonflies disappear almost overnight. On still mornings, mist sits on the water until the sun climbs over the treeline.",
    "Drought has lowered the river to its bones. Gravel bars stand exposed where boats anchored last summer. The fish crowd into the deep pools below the bridge, and the herons know it. Farmers watch the forecast the way sailors watch the sky.",
    "The first snow rarely stays. It falls overnight, outlines every branch and wire, and melts by noon. The second snow means business. It arrives with wind, drifts against the fences, and settles in until March. Locals can tell the difference before breakfast.",
    "Lightning started three small fires on the ridge last night. Rain followed within the hour and put out two of them. Crews reached the third by morning. Smoke hung in the valley through the afternoon, turning the sun the color of an old coin.",
    "The tide pools hold their own small worlds. Anemones close like fists when a shadow passes. Hermit crabs argue over shells. A gull works a mussel against the rocks with real patience. Stay an hour and the pool forgets you are there.",
    # --- memos / email -------------------------------------------------------
    "Team, the quarterly review moves to Thursday at ten. Please update your project summaries by Wednesday evening. Keep each summary under one page. The budget discussion follows immediately after, so bring your revised figures. Coffee and pastries are on the department this time.",
    "A reminder that the parking garage closes for maintenance this weekend. The north lot remains open, and the shuttle runs every twenty minutes from the transit center. Badge access to the east entrance is unaffected. Facilities apologizes for the short notice.",
    "The new expense system goes live on the first of the month. Submit any outstanding reports in the old system by Friday. Receipts now upload directly from your phone. Training sessions run twice daily next week, and the guide is posted on the intranet.",
    "Thanks to everyone who helped with the office move. All crates arrived, and the network came up ahead of schedule. Report any damaged equipment to the helpdesk by Thursday. The old building closes permanently on Friday, so collect any personal items before then.",
    "Our vendor confirmed the shipment left the warehouse on Tuesday. Customs clearance usually takes three business days. I will forward the tracking details this afternoon. If the parts arrive by Monday, installation can still finish within the quarter. I will flag any slip immediately.",
    "The hiring committee meets Friday to review the final candidates. Please submit your interview notes by Thursday noon. We have approval for two positions, not three, so rank your preferences clearly. References have been checked for all four finalists.",
    "Building management will test the fire alarms on Wednesday between eight and nine in the morning. No evacuation is required. The elevators will pause briefly during the test. Anyone with sensitive recordings scheduled for that hour should plan around the noise.",
    "The annual security training is due by the end of the month. The course takes about forty minutes and saves your progress. Completion syncs to the compliance dashboard overnight. Managers receive a reminder list every Monday until their teams reach one hundred percent.",
    # --- popular science ------------------------------------------------------
    "Octopuses taste with their arms. Each sucker carries chemical receptors, so the animal samples everything it touches. The arms also act with surprising independence, solving small problems without waiting for instructions. Researchers still argue about where the deciding actually happens.",
    "A glacier moves like very slow honey. Ice near the base deforms under the weight above it, and the whole mass creeps downhill a few centimeters a day. Meltwater underneath can lubricate the bed and double the speed. Satellites now track these changes weekly.",
    "The human nose can distinguish an enormous range of odors, far more than early textbooks claimed. Smell connects directly to the brain's memory centers, which explains why a scent can summon a childhood kitchen in an instant. Trained perfumers name hundreds of notes from a single passing whiff.",
    "Honeybees vote. When a swarm needs a new home, scouts inspect candidate sites and report back with dances. The more a scout favors a site, the longer she dances. Support builds until one site wins a quorum. The swarm then moves together, guided by a few hundred informed bees.",
    "Lightning heats the air in its channel to several times the temperature of the sun's surface. The surrounding air expands violently, and we hear the expansion as thunder. Count the seconds between flash and rumble, divide by three, and you have the distance in kilometers.",
    "Trees in a forest share resources through fungal networks at their roots. A shaded seedling can receive sugars from a tall neighbor. The fungi take their cut, moving phosphorus and nitrogen the other way. Foresters once dismissed the idea; the measurements changed their minds.",
    "Your phone's positioning relies on clocks so precise they must be corrected for relativity. Satellites orbit in weaker gravity and at high speed, so their clocks drift from ours by microseconds a day. Without the correction, map positions would wander by kilometers within hours.",
    "Sourdough rises because wild yeast and bacteria divide the labor. The yeast produces the gas that lifts the dough. The bacteria produce the acids that give the loaf its tang and keep rival microbes out. A neglected starter does not die easily; it waits.",
    # --- history --------------------------------------------------------------
    "The canal took nine years to dig and changed the town forever. Grain that once traveled overland in wagons now moved by barge at a fraction of the cost. Warehouses rose along the banks within a decade. The railway arrived thirty years later and began the canal's long decline.",
    "Medieval scribes worked in cold rooms with short days. A single book could take a year of labor. Mistakes were scraped off the parchment with a knife, which is why erasers still carry an echo of that gesture. Marginal notes preserve their complaints about bad ink and aching backs.",
    "The lighthouse keeper's logs survive in the county archive. They record storms, shipwrecks, supply runs, and decades of small repairs. One entry notes a whale stranded on the south beach in 1871. The handwriting changes abruptly in 1904, when the keeper's daughter took over the post.",
    "Before refrigeration, ice was a crop. Crews cut blocks from frozen lakes in winter and packed them in sawdust for the summer trade. Ships carried ice across oceans to cities that had never seen snow. The industry vanished within a generation once compressors became cheap.",
    "The old road over the pass follows a route older than any record. Bronze traders used it, then armies, then mail coaches. Sections of the original paving surface appear after heavy rain. The modern highway tunnels below, and the pass belongs to hikers now.",
    "The town's first printing press arrived by ship in pieces and was assembled by a clockmaker. Its first job was a tide table; its second was a hymnal. Within five years, the town had two newspapers that disagreed about everything. Both archives burned in the fire of 1888.",
    "Census records show the village doubled between 1840 and 1860, then emptied within twenty years. The mine closed, and the young left first. Photographs from the period show storefronts already boarded. Today the church and the schoolhouse remain, maintained by a society of descendants.",
]


def main():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = os.path.join(root, "fixtures", "heldout_prose.jsonl")
    with open(out, "w") as f:
        for p in PARAGRAPHS:
            f.write(json.dumps({"doc_texts": [p]}) + "\n")
    n_sents = sum(p.count(". ") + p.count("! ") + p.count("? ") + 1
                  for p in PARAGRAPHS)
    print(f"wrote {len(PARAGRAPHS)} paragraphs (~{n_sents} sentences) -> {out}")


if __name__ == "__main__":
    main()
