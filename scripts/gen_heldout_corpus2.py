#!/usr/bin/env python
"""Freeze the SECOND held-out prose corpus (fixtures/heldout_prose2.jsonl).

Provenance: every paragraph below was hand-composed for this corpus in a
single pass, across eight registers DISJOINT from corpus #1's twelve
(legal / contracts, recipes, forum and chat posts, academic abstracts,
workplace email, customer support, meeting minutes, encyclopedia
entries).  The text was written WITHOUT consulting the parser, the
lexicon, or the transcript generator, and the file was committed before
the first coverage measurement — unscreened by construction, same
protocol as corpus #1 (VERDICT r5 Next #3).  The grammar may be grown
against the failures this corpus exposes; the corpus itself is frozen
and never edited to flatter the parser.

Output format matches fixtures/heldout_prose.jsonl: one JSON object per
line, {"doc_texts": [paragraph]}.
"""
import json
import os

PARAGRAPHS = [
    # --- legal / contracts --------------------------------------------------
    "The tenant shall pay rent on the first day of each month. A late fee applies after the fifth day. The landlord must provide written notice before entering the unit, except in an emergency. Either party may terminate this agreement with sixty days of notice.",
    "The parties agree that the deposit secures the performance of this lease. The landlord shall return the deposit within thirty days after the tenancy ends. Deductions require an itemized statement. The tenant may dispute any deduction in writing within fourteen days.",
    "The contractor warrants that the work will conform to the drawings and the specifications. Defects reported within one year will be corrected at no cost to the owner. This warranty excludes damage caused by misuse or by ordinary wear. The remedy described here is the exclusive remedy.",
    "The court granted the motion in part. The claims against the distributor were dismissed without prejudice, and the claims against the manufacturer survived. The judge noted that the complaint lacked specific dates. The plaintiffs may amend their filing within twenty days.",
    "Neither party shall be liable for a failure caused by events beyond its reasonable control. Such events include floods, strikes, and interruptions of public utilities. The affected party must notify the other party promptly. Performance resumes when the event ends.",
    "The seller disclosed a prior repair to the roof and a leak in the basement. The buyer accepted the property in its present condition after an independent inspection. Closing occurred on the tenth of March. The deed was recorded with the county the following week.",
    "This license grants a single user the right to install the software on two devices. The user may not rent, lease, or sublicense the software. Updates are provided at the discretion of the publisher. Termination of the license ends all rights granted here.",
    "The committee reviewed the proposed ordinance and recommended two changes. The first change narrows the definition of a short-term rental. The second change delays enforcement until January. The council will hold a public hearing before the final vote.",
    "The witness testified that the intersection was poorly lit. She stated that the truck entered the crossing against the signal. Counsel for the defense objected twice during the testimony, and the court overruled both objections. The jury was excused before noon.",
    "The borrower shall maintain insurance on the collateral for the life of the loan. Proof of coverage must be delivered to the lender each year. A lapse in coverage constitutes a default under this agreement. The lender may purchase replacement coverage and add the cost to the balance.",
    "The arbitrator found that the company had breached the service agreement. The award included the unpaid invoices and interest from the date of each invoice. Both parties bear their own legal costs. The award is final and binding under the rules the parties selected.",
    "An easement runs along the northern boundary of the parcel. The easement permits the utility to access its lines for maintenance. The owner may plant shallow-rooted vegetation within the easement. Permanent structures are prohibited in that strip.",
    "The policy covers water damage from a burst pipe but excludes damage from gradual seepage. The adjuster inspected the property two days after the claim was filed. The insurer issued a partial payment for the kitchen floor. The homeowner appealed the valuation of the cabinets.",
    # --- recipes -------------------------------------------------------------
    "This bread needs no kneading. The wet dough rests overnight, and the long wait builds its flavor. A heavy pot traps the steam, which gives the loaf its dark crust. The recipe forgives almost every mistake except impatience.",
    "Heat the oil in a wide pan until it shimmers. Add the onions with a pinch of salt and cook them slowly until they turn deep gold. This takes longer than most recipes admit, usually forty minutes. Stir often near the end, because the sugars burn quickly.",
    "The soup begins with a whole chicken and a pot of cold water. Bring the water to a bare simmer and skim the foam from the surface. Carrots, celery, and an onion go in after the first hour. The broth is ready when it tastes like more than the sum of its parts.",
    "My grandmother measured nothing. Her dumplings came together from flour, two eggs, and whatever the day suggested. The dough should feel soft but not sticky. She dropped spoonfuls into boiling broth, and they were done when they floated.",
    "Whisk the eggs and the sugar until the mixture turns pale and thick. Fold in the flour gently, because the air in the batter does the lifting. The cake bakes for thirty minutes, and the top springs back when it is ready. It keeps for three days under a dome.",
    "A good tomato sauce needs only four things. Tomatoes, olive oil, garlic, and salt carry the whole dish. Simmer the sauce uncovered so it thickens, and taste it before serving. A spoonful of butter at the end rounds the acidity.",
    "Rinse the rice until the water runs clear. This step removes the loose starch and keeps the grains separate. Use one part rice to one and a half parts water. After the water boils, the pot stays covered on the lowest heat for twelve minutes, and then it rests off the heat for ten more.",
    "The marinade works on chicken, pork, or firm tofu. Soy sauce brings salt, honey brings sweetness, and the vinegar keeps everything bright. Thirty minutes is enough for thin cuts. Overnight is better for a whole roast.",
    "Brown the beef in batches so the pan stays hot. Crowded meat steams instead of searing, and the stew loses its backbone. Deglaze the pot with a glass of red wine. Every dark scrap on the bottom dissolves into the sauce.",
    "The pastry comes together fastest in a cold kitchen. Cut the butter into the flour until the pieces look like peas. Ice water binds the dough, and a light hand keeps it tender. The dough rests in the refrigerator for an hour before rolling.",
    "Salt the eggplant and let it sit in a colander for half an hour. The salt draws out the bitterness and collapses the flesh slightly. Pat the slices dry before they meet the oil. They fry to a silky texture that roasting cannot match.",
    "This jam needs equal weights of fruit and sugar. Cook the mixture in a wide pan so the water evaporates quickly. A plate in the freezer makes testing easy, because a spoonful sets on the cold surface when the jam is ready. The jars seal as they cool.",
    "Toast the spices in a dry pan until they smell loud. Grind them while they are still warm. The powder loses its edge within a week, so small batches make sense. A jar in a dark cupboard stretches the life a little further.",
    # --- forum / chat ---------------------------------------------------------
    "Has anyone else had this problem with the latest update? My laptop freezes about once an hour, and the fan runs constantly. I rolled back the driver and the freezing stopped. The vendor forum has a thread about it, but there is no official fix yet.",
    "I finally finished the trail you all recommended. The first climb nearly ended me, but the view from the saddle was worth every step. We saw marmots near the lake. Bring more water than you think you need, because the spring at the halfway point was dry.",
    "The seller shipped my order in two days, and the packaging was excellent. The color is slightly darker than the photos suggest. It fits true to size. I would buy from this shop again without hesitation.",
    "My sourdough starter smells like nail polish. From what I have read, that means it is hungry. I fed it twice a day for three days, and the smell faded. The loaf I baked yesterday rose better than any previous attempt.",
    "We adopted a retired racing greyhound last month. He sleeps about twenty hours a day and has never once barked. Stairs confused him at first, because he had never seen them. A ramp solved the problem while he learned.",
    "The mechanic quoted me a price that seemed high, so I asked here first. Two of you said the part itself costs forty dollars. I bought the part and watched a video, and the repair took twenty minutes. This forum saved me three hundred dollars.",
    "Does this plant look sick to anyone else? The leaves have yellow edges and a few brown spots. It sits near a south window and I water it weekly. Someone in another thread suggested the pot lacks drainage, and I suspect they are right.",
    "Quick update on the keyboard I posted about. The replacement switches arrived on Friday, and the soldering went smoothly. The new springs feel lighter than I expected. My typing speed has not improved, but the sound is wonderful.",
    "I passed the exam on my second attempt. The practice tests from the wiki were harder than the real thing, which helped. I studied about an hour a day for two months. Ask me anything about the registration process, because the official page explains it badly.",
    "The landlord finally fixed the radiator after three emails. The trick was mentioning the city code section that a neighbor posted here. Heat reached the back bedroom for the first time this winter. Thanks to everyone who replied.",
    "My cat has decided that the new couch belongs to her. A scratching post stands unused two feet away. Double-sided tape on the armrest worked for about a week. I have accepted my place in this household.",
    "The meetup moved to the cafe on Fifth Street this month. Parking behind the building is free after six. We will start with the usual introductions, and then a guest speaker will show her photos from the eclipse trip. Newcomers are welcome.",
    "Warning for anyone using the budget airline this weekend. My flight was moved twice, and the gate changed three times. The app showed the old gate until after boarding had started. The staff were kind, but the system clearly failed them.",
    # --- academic abstracts ---------------------------------------------------
    "We study the effect of staggered planting dates on maize yield under variable rainfall. Field trials across three seasons show that a two-week stagger reduces total crop failure risk by a third. The gain comes mostly from drought avoidance in the flowering window. A simple decision rule captures most of the benefit.",
    "This paper examines how commuters respond to unplanned transit disruptions. Using fare card data from a major metro system, we track individual behavior after a tunnel closure. Most riders returned within two weeks, but a persistent minority shifted to buses permanently. The findings inform resilience planning for aging networks.",
    "The survey covers recent advances in low-power wide-area networking. We classify protocols by modulation scheme, duty cycle, and deployment topology. Trade-offs between range and throughput remain the central design tension. Open problems include dense-deployment interference and firmware update delivery.",
    "We present a method for dating charcoal samples contaminated by modern carbon. The approach combines stepped combustion with a correction model fitted on known-age samples. Errors fall below forty years for samples younger than five millennia. The method extends reliable dating to several disturbed sites.",
    "Sleep restriction alters glucose metabolism in healthy adults. In a crossover design, participants slept either five or eight hours for six nights. The short-sleep condition reduced insulin sensitivity by a fifth. Recovery sleep restored baseline values within three nights.",
    "This study quantifies plastic transport in an urban river across a full hydrological year. Floating booms captured debris at three stations, and weekly counts were normalized by discharge. Storm events carried two-thirds of the annual load. Upstream interventions would intercept most of the mass at a single meander.",
    "We investigate whether small classes improve outcomes in rural primary schools. A lottery assigned pupils to classes of twenty or thirty-five for two years. Reading scores improved modestly in smaller classes, while mathematics showed no effect. Teacher experience mattered more than class size on every measure.",
    "The paper introduces a corpus of handwritten administrative records from the eighteenth century. Two thousand pages were transcribed twice and adjudicated by a third annotator. We report inter-annotator agreement and common ambiguity classes. The corpus supports research on historical demography and on handwriting recognition.",
    "Coral recovery after bleaching depends on herbivore abundance. We monitored forty reef plots for five years following a mass bleaching event. Plots with intact parrotfish populations regained half their cover, while overfished plots stagnated. Local fishing rules thus shape regional recovery trajectories.",
    "We propose a lightweight verification pass for compiler optimizations. The pass checks a machine-readable witness emitted by each transformation. Checking is an order of magnitude faster than re-running the optimizer. The approach caught three previously unknown bugs in a production toolchain.",
    "This article revisits the wage effects of early industrial apprenticeships. Parish records link apprentices to their adult occupations across two generations. Completed apprenticeships raised lifetime earnings, but the premium fell sharply after mechanization. The results qualify older narratives of guild decline.",
    "Aerosol sampling above the boundary layer remains sparse. We equipped commercial gliders with passive collectors and flew sixty sorties over one summer. Particle composition varied more with altitude than with region. The platform offers a low-cost complement to research aircraft.",
    "The experiment tests whether framing affects household energy conservation. Ten thousand customers received reports comparing them to efficient neighbors or to their own past usage. Neighbor comparisons cut consumption twice as much as self comparisons. Effects persisted for a year after the reports stopped.",
    # --- workplace email ------------------------------------------------------
    "Thanks for the quick turnaround on the draft. I left comments on the second and fourth sections, mostly about the budget table. The timeline looks realistic to me. Could you send the revised version before Thursday so legal has a full day with it?",
    "A reminder that the parking garage closes for resurfacing next week. Street parking passes are available at the front desk. The work should finish by Friday evening. Deliveries will be redirected to the loading dock on the east side.",
    "The onboarding session for the new hires moved to Room 4 because the projector in Room 2 failed. The agenda stays the same. Lunch arrives at noon, and the benefits team joins at one. Please bring your laptop and your badge.",
    "I reviewed the vendor proposals over the weekend. The second bid offers the best support terms, though its price runs higher. The cheapest bid excludes training entirely, which worries me. I suggest we shortlist two vendors and schedule calls for next week.",
    "Our quarterly numbers came in above forecast, driven mostly by the renewal campaign. Churn dropped for the third straight quarter. The board deck needs these figures by Wednesday. Maria owns the revenue slides, and I will cover the hiring plan.",
    "The server migration finished last night without customer impact. Two internal dashboards still point at the old database, and we will fix them today. Passwords did not change. If anything looks wrong, file a ticket and tag the infrastructure channel.",
    "Welcome aboard! Your first week schedule is attached. Tuesday morning is reserved for security training, which everyone must complete before receiving repository access. Your mentor is Priya, and she sits two desks from the kitchen. Ask her anything.",
    "The client pushed our presentation to Monday, which gives us the weekend if we need it. I would rather we finish Friday. The demo environment is stable, and the script ran cleanly twice today. Rehearsal is at three in the small conference room.",
    "Expense reports for March are due by the fifth. The finance team flagged several reports last month for missing receipts. The mobile app lets you photograph receipts at the point of sale, which avoids the problem entirely. Late reports roll into the next cycle.",
    "The office closes early on the day before the holiday. Building security asks that all visitors leave by four. The support rotation continues as scheduled, and the on-call phone transfers automatically. Enjoy the long weekend.",
    "I spoke with the printer about the banner order. The proof shows the old logo, so I rejected it. The corrected proof arrives tomorrow morning. We still meet the conference deadline if we approve it by noon.",
    "Performance reviews open next Monday and close at the end of the month. Please complete your self-assessment before meeting with your manager. The form has three sections this year instead of five. Calibration happens in the first week of the following month.",
    "The recycling bins in the kitchen were replaced with a three-stream system. Compost goes in the green bin, and the hauler rejects bags in any bin. A one-page guide hangs above the counter. Facilities will answer questions at the town hall.",
    # --- customer support -----------------------------------------------------
    "Thank you for contacting us about your order. The package left our warehouse on Tuesday and is moving through the regional hub. Tracking sometimes pauses for a day at that facility. If nothing updates by Friday, reply to this message and we will open a trace.",
    "We are sorry the blender arrived with a cracked jar. A replacement jar ships today at no cost, and you do not need to return the damaged one. The new jar arrives within five business days. Your warranty remains unchanged by this replacement.",
    "Your subscription renewed automatically on the third, as set out in your plan. Since you contacted us within the grace period, we have issued a full refund. The refund reaches your card within ten business days. Auto-renewal is now disabled on your account.",
    "The error you describe usually means the app cache is stale. Signing out and back in clears it in most cases. If the problem continues, the settings page has a reset option under the storage section. Your saved projects survive both steps.",
    "We received the photos of the damaged table, and the claim is approved. You may keep or discard the damaged item, whichever is easier. Store credit posts to your account today, and a replacement can be ordered at any time. The credit does not expire.",
    "Our records show the technician visit is booked for Thursday between nine and noon. The technician calls thirty minutes before arrival. Someone over eighteen must be present. Rescheduling is free up to one day before the appointment.",
    "The discount code failed because it expired at the end of last month. We understand the banner was still visible, and that is our mistake. We have applied an equivalent credit to your order. The corrected invoice is attached.",
    "Your account was locked after several failed sign-in attempts, which is a standard protection. The reset link in this message stays valid for one hour. Choosing a password you have not used before avoids a second lock. Two-factor authentication prevents most of these events.",
    "The part you asked about fits models made after 2019. Your serial number places your machine in 2017, so the part will not fit. The compatible part is listed below, and it costs the same. Fitting instructions are identical for both.",
    "We have escalated your report about the billing duplicate. The duplicate charge is visible on our side and will reverse automatically within three days. No action is needed from you. We added a month of service to your plan for the trouble.",
    "The mobile app update released this morning fixes the crash you reported. Your crash logs helped the team reproduce the bug, and we are grateful. Update through your usual app store. The fix also improves start-up time on older phones.",
    "Your return arrived at our warehouse yesterday. The inspection finished this morning, and the refund has been issued in full. Returns from your region usually complete faster than the quoted window. We hope to see you again.",
    "Gift orders ship without prices on the packing slip. The gift message prints on a card inside the box. The recipient can exchange sizes without involving you. Exchanges do not reveal the original price.",
    # --- meeting minutes ------------------------------------------------------
    "The board met at seven and approved the minutes of the previous meeting. The treasurer reported a balance of twelve thousand dollars. Membership renewals run ahead of last year. The meeting adjourned at half past eight.",
    "The safety committee reviewed the incident from March. A delivery cart blocked the fire exit for roughly twenty minutes. The committee recommended floor markings and a weekly walk-through. Facilities accepted both recommendations and will report back next month.",
    "Four members attended, and one joined by phone. The grant application was the only agenda item. Sofia presented the draft budget, and the members trimmed the equipment line. The final application goes out on Friday.",
    "The planning group discussed the venue for the autumn fair. The school gym is free but small, while the fairground costs more and needs insurance. A vote was postponed until the insurance quote arrives. The bake sale subcommittee reported record interest.",
    "The residents association heard an update on the playground repairs. The contractor replaced the swing frame and will return for the fence. Two quotes for new benches were compared. The cheaper quote was accepted, subject to a reference check.",
    "The committee welcomed two new members and noted one resignation. The annual report was approved without changes. A discussion about meeting frequency ended with a decision to stay monthly. The library confirmed the room booking for the rest of the year.",
    "The curriculum working group compared three textbook options. Teachers preferred the second option for its exercises, and the cost fell within budget. A pilot in two classrooms begins after the break. Parents will be surveyed at the end of the pilot.",
    "The finance subcommittee examined the insurance renewal. The premium rises by eight percent, which tracks the market. Switching providers would save little and cost continuity. The subcommittee recommended renewal for one year.",
    "The volunteers coordinator reported ninety active volunteers, a record. Training sessions filled within a day of being announced. The kitchen team asked for two more members. A recruitment notice will run in the newsletter.",
    "The heritage society agreed to catalogue the photograph collection. A student intern starts in June, funded by the county grant. Storage boxes were ordered last week. The oldest photographs will be digitized first.",
    "The sports club reviewed the season. Two teams reached their finals, and injuries fell compared with last year. The physiotherapy partnership was credited for the improvement. The club will extend the partnership and fund a second training evening.",
    "The parish council considered the drainage complaint on Elm Lane. The county engineer had inspected the ditch and found a collapsed culvert. Repair falls under county responsibility, and the clerk will write to the department. The council will track the matter monthly.",
    "The neighborhood watch reported a quiet quarter. Porch thefts fell after the camera campaign. Two streetlights remain dark despite reports, and the chair will escalate them. The next meeting moves to the community hall.",
    # --- encyclopedia entries -------------------------------------------------
    "The common swift spends almost its entire life in the air. It feeds, sleeps, and even mates on the wing, landing only to nest. Swifts return to the same nesting sites each year, often under roof tiles. A single bird may fly several million kilometers in its lifetime.",
    "Basalt is a dark volcanic rock formed from rapidly cooled lava. It covers large parts of the ocean floor and builds plateaus on several continents. Its fine grain reflects the speed of its cooling. Weathered basalt produces fertile soils prized by farmers.",
    "The city grew around a ford where the river ran shallow. Medieval merchants built warehouses along the banks, and a stone bridge replaced the ford in the fourteenth century. The old quarter preserves the original street plan. Flooding shaped the city's laws and its architecture alike.",
    "Paper money first circulated widely in eleventh-century China. Merchants deposited coins with trusted houses and traded the receipts. The state later took over the issue of notes. Excessive printing led to the world's first documented paper inflation.",
    "The lighthouse stands on a granite shelf three kilometers offshore. Its first keeper rowed supplies from the mainland once a month. The light was automated in 1982, and the keeper's cottage now hosts researchers. Seabirds nest on the shelf in spring.",
    "The moth's larvae feed only on nettle leaves. Adults fly in two generations between May and September. The species expanded northward during the last century, tracking milder winters. Gardens with untrimmed margins support the densest populations.",
    "The canal linked the coalfields to the port in under a day. Mule teams walked the towpath until engines replaced them. Railways took the freight within a generation, and the canal fell quiet. Today its locks lift pleasure boats instead of barges.",
    "The alphabet reached the island with traders and took root slowly. Carved stones preserve the earliest local inscriptions. Monastic schools standardized the letter forms. A printed grammar appeared only in the seventeenth century.",
    "The reservoir supplies water to half a million people. Its dam rose over eight years, displacing three villages whose church towers still stand below the waterline. In dry summers the old walls break the surface. The sight draws photographers and former residents alike.",
    "The festival began as a harvest market in the fifteenth century. Plague years interrupted it twice, and war interrupted it once more. The modern festival keeps the market's opening bell. Stalls still line the same three streets.",
    "The glacier retreated four kilometers in the last century. Its meltwater feeds two river systems and a chain of new lakes. Monitoring stations record the retreat weekly. The valley floor exposes soil that last saw sunlight thousands of years ago.",
    "The observatory occupies a ridge above the cloud line. Astronomers chose the site for its steady air and its dark skies. The first dome housed a refractor donated by a shipping magnate. Modern instruments share the ridge with the restored original.",
    "The grape variety ripens late and resists rot. Growers prize it for wines that age for decades. Its thick skin shrugs off autumn rains that ruin earlier varieties. Plantings have doubled as summers have lengthened.",
]

OUT = os.path.join(os.path.dirname(__file__), "..", "fixtures",
                   "heldout_prose2.jsonl")


def main():
    with open(OUT, "w") as f:
        for p in PARAGRAPHS:
            f.write(json.dumps({"doc_texts": [p]}) + "\n")
    print(f"wrote {len(PARAGRAPHS)} paragraphs -> {OUT}")


if __name__ == "__main__":
    main()
