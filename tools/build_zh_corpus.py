"""Build the vendored ZH divergence corpus (assets/zh_corpus.txt).

The pypinyin-divergence estimator (tools/zh_divergence.py) needs a few
thousand sentences of running Mandarin to bound the long-tail reading risk
(VERDICT r4 missing #3) — 30 built-in probes cannot. This generator composes
a ~2.4k-sentence corpus deterministically from

  - ~180 hand-written sentences (news / conversation / literary register,
    polyphone-heavy on purpose), and
  - sentence templates x vocabulary pools (objects, places, people, verbs,
    adjectives), which trade per-sentence novelty for WORD coverage — the
    estimator measures word-level divergence, so breadth of vocabulary in
    varied frames is what samples the phrase dictionary.

Output is committed (bert_vits2_tpu/text/assets/zh_corpus.txt); rerun this
script only to regenerate it.
"""

from __future__ import annotations

import os

HAND = """\
今天天气很好，我们一起去公园散步吧。
这家银行的行长正在开会，请稍等一会儿。
他在重庆工作了三年，去年才回到北京。
经济增长速度放缓，市场反应比较平静。
孩子们在操场上快乐地奔跑。
她觉得这首曲子的曲调非常优美。
老师教我们数学，也教我们做人的道理。
种子发芽之后，要及时浇水施肥。
他把行李放在了火车站的寄存处。
这篇传记记录了将军的一生。
商店里的东西都打了折扣。
医生给病人开了三种药。
长城是中国古代伟大的建筑。
研究人员正在调查事故的原因。
他弹了一首曲子，大家都鼓掌喝彩。
请把这封信交给王处长。
农民种地很辛苦，粮食来之不易。
会议的内容还没有传达下去。
这条裙子比那条便宜得多。
他因为工作出色而得到了提拔。
地上的积雪还没有融化。
政府出台了新的环保政策，企业必须限期整改。
科学家在实验室里观察细胞的分裂过程。
股市行情波动很大，投资者都很谨慎。
他宁可自己吃亏，也不愿意为难别人。
这种药的疗效还没有得到充分验证。
消防员冒着生命危险冲进了着火的大楼。
爷爷每天早晨在院子里打太极拳。
飞机因为大雾延误了三个小时才起飞。
她把头发扎成了一个马尾辫。
博物馆里收藏着许多珍贵的文物。
谈判进行得很艰难，双方都不肯让步。
他出差的时候顺便看望了大学同学。
这篇论文的数据处理方法存在明显缺陷。
秋天到了，枫叶红得像火一样。
工人们正在铺设新的地下管道。
她的嗓子哑了，说话很吃力。
长江流域今年的降水量明显偏多。
他把省下来的钱都捐给了山区的孩子。
乐队正在排练新创作的交响乐。
这个角色的台词特别难背。
警察很快查明了案件的真相。
奶奶用和好的面蒸了一锅馒头。
运动员们在赛场上顽强拼搏。
公司的会计正在核对上个月的账目。
他性格倔强，认定的事情从不回头。
春节期间火车票特别难买。
图书馆新到了一批外文原版书。
这首民歌在当地流传了几百年。
厨师把调料的比例掌握得恰到好处。
台风过境，沿海地区损失惨重。
他大学学的是应用物理专业。
小贩在街头吆喝着兜售水果。
婚礼的日子定在十月一号。
这种布料摸起来又软和又舒服。
登山队员在恶劣的天气里继续攀登。
评委对选手的表现给予了很高的评价。
大夫叮嘱他按时吃药，多喝开水。
姐姐在银行办理了住房贷款。
展览会上陈列着各式各样的工艺品。
他把自行车修理好又骑了五年。
村里新修的水渠解决了灌溉问题。
辩论双方你来我往，互不相让。
孩子把压岁钱存进了储蓄罐。
肥沃的黑土地适合种植大豆和玉米。
演员们谢幕的时候观众掌声雷动。
这起纠纷最终通过调解得到了解决。
清晨的薄雾笼罩着安静的小镇。
他在朋友的担保下租到了房子。
超市正在处理临近保质期的食品。
蚂蚁搬家往往预示着要下雨。
教练调整了战术，球队士气大振。
她的散文写得清新自然。
重阳节那天我们陪老人登高望远。
工程质量必须经得起时间的检验。
他得意地向大家炫耀自己的新手机。
营业员热情地给顾客量尺寸。
山洪冲垮了通往村里的唯一一座桥。
考古队在墓穴里发现了大量陶器。
相声演员的包袱抖得恰到好处。
妈妈把剩下的饭菜倒进了泔水桶。
部队在崇山峻岭之间安营扎寨。
他俩因为一点小事闹得不可开交。
果园里的苹果压弯了枝头。
乘务员提醒旅客系好安全带。
法院当庭宣判了这起盗窃案。
屋檐下的燕子正忙着筑巢。
他自告奋勇承担了最艰巨的任务。
博士论文答辩安排在下周三上午。
渔民们趁着涨潮把船开出了港口。
电工检查了线路，排除了安全隐患。
她兴冲冲地跑来报告这个好消息。
古镇的石板路被岁月磨得发亮。
小区门口新开了一家便利店。
双方就合同条款达成了初步协议。
幼儿园的老师教孩子们折纸飞机。
暴雨导致地铁部分区段临时停运。
他把祖传的手艺毫无保留地传给了徒弟。
山坡上的野花开得漫山遍野。
裁缝给他量身定做了一套西服。
会议决定成立专门小组处理善后事宜。
老中医给她号了脉，开了几服中药。
码头上的集装箱堆得像小山一样。
他发表的论文被多家期刊转载。
晚会在欢快的乐曲声中落下帷幕。
管理员把图书按类别重新编了号。
货轮满载着机械设备驶向远洋。
她在阳台上种了几盆多肉植物。
消息传来，整个车间都沸腾了。
他谦虚地说自己只是尽了本分。
悬崖峭壁上生长着顽强的松树。
采购员货比三家，终于谈妥了价格。
新年的钟声敲响时，广场上礼花绽放。
他长年累月地坚持晨跑，身体硬朗。
县里拨款重修了这所乡村小学。
乐手们调好音准备开始演奏。
征文比赛的获奖名单已经公布。
大坝拦住了汹涌的洪水。
她一边哼着小曲一边收拾屋子。
地质队员背着仪器翻山越岭。
这家老字号的酱菜远近闻名。
辅导员耐心解答了新生的疑问。
工地上的塔吊不停地运转。
他省吃俭用供两个孩子读完了大学。
春雨过后，竹笋争先恐后地钻出地面。
质检员对每一批产品都严格把关。
深夜的急诊室依然灯火通明。
他把多年的积蓄投进了这家小厂。
游客们排着长队等候参观故宫。
秘书把文件整理得井井有条。
骤然而至的寒潮让气温降了十度。
维修工爬上电线杆抢修线路。
她的一番话说得大家心服口服。
果农正忙着给桃树剪枝。
参观者在纪念碑前默哀致敬。
这个提案在表决中获得全票通过。
邮递员顶着烈日挨家挨户送信。
孩子们围着篝火唱歌跳舞。
银行职员仔细核验了他的身份证件。
高原上的天气说变就变。
他婉言谢绝了对方的重金聘请。
清洁工凌晨四点就开始清扫街道。
实验数据与理论预测基本吻合。
姑娘们穿着节日的盛装跳起了舞。
仓库里的货物码放得整整齐齐。
他一口气游到了湖对岸。
印刷厂连夜赶印这批教材。
老人靠在藤椅上晒太阳。
志愿者为灾区募集了大批物资。
山谷里回荡着伐木工人的号子。
她用攒下的零花钱买了一套画笔。
审计部门对这笔开支提出了质疑。
牧民赶着羊群转场到夏季牧场。
大厅里悬挂着名家书写的对联。
他试探着提出了自己的想法。
货架上的商品琳琅满目。
远处的雪山在夕阳下泛着金光。
调度员合理安排了车辆的班次。
她把窗台擦得一尘不染。
旱情缓解后农民抓紧时间补种。
讲解员生动地介绍了馆藏的来历。
他执意要把客人送到车站。
峡谷中的激流撞击着礁石。
财务科按月发放职工的工资。
孩子好奇地拨弄着算盘珠子。
边防战士在风雪中站岗执勤。
超市的收银台前排起了长龙。
他认认真真地把合同读了三遍。
麦田在微风中掀起金色的波浪。
导游举着小旗招呼团员集合。
她的设计方案在评审中脱颖而出。
修表匠戴着放大镜专心工作。
礼堂里座无虚席，连过道都站满了人。
""".strip().splitlines()

# ---- template expansion: breadth of vocabulary in varied frames ----

PEOPLE = [
    "老师", "医生", "工程师", "司机", "厨师", "警察", "记者", "画家",
    "农民", "工人", "售货员", "科学家", "飞行员", "护士", "律师",
    "演员", "作家", "翻译", "教授", "编辑", "木匠", "裁缝", "邮递员",
    "图书管理员", "消防员", "导游", "会计师", "理发师", "园丁", "船长",
]
PLACES = [
    "北京", "上海", "广州", "深圳", "重庆", "成都", "杭州", "南京",
    "武汉", "西安", "长沙", "厦门", "青岛", "大连", "昆明", "兰州",
    "哈尔滨", "乌鲁木齐", "拉萨", "呼和浩特", "苏州", "无锡", "宁波",
    "佛山", "东莞", "天津", "沈阳", "郑州", "石家庄", "太原",
]
OBJECTS = [
    "雨伞", "钢笔", "词典", "行李箱", "照相机", "眼镜", "手表", "钱包",
    "围巾", "手套", "拖鞋", "台灯", "闹钟", "水壶", "剪刀", "梳子",
    "毛巾", "肥皂", "牙刷", "镜子", "抽屉", "窗帘", "地毯", "沙发",
    "冰箱", "洗衣机", "微波炉", "电风扇", "暖气片", "插座",
]
FOODS = [
    "饺子", "包子", "面条", "米饭", "豆腐", "馒头", "油条", "粥",
    "烤鸭", "火锅", "小笼包", "春卷", "月饼", "粽子", "汤圆", "麻花",
    "煎饼", "馄饨", "拉面", "盖浇饭", "红烧肉", "糖醋鱼", "炒青菜",
    "西红柿炒鸡蛋", "酸辣汤", "皮蛋瘦肉粥", "葱油饼", "酱牛肉",
]
ADJS = [
    "漂亮", "干净", "结实", "新鲜", "便宜", "昂贵", "轻巧", "沉重",
    "柔软", "粗糙", "光滑", "锋利", "陈旧", "崭新", "精致", "简陋",
    "宽敞", "狭窄", "明亮", "昏暗", "安静", "热闹", "整齐", "凌乱",
]
VERBS = [
    "修理", "打扫", "整理", "检查", "观察", "研究", "设计", "制造",
    "搬运", "清洗", "保养", "收拾", "挑选", "包装", "测量", "称量",
    "记录", "统计", "核对", "翻译", "朗读", "背诵", "抄写", "描绘",
]
WEATHER = ["晴朗", "阴沉", "凉爽", "闷热", "寒冷", "暖和", "干燥", "潮湿"]

TEMPLATES_PV = [  # person x verb/object frames
    "那位{p}正在仔细地{v}一台旧机器。",
    "{p}把工具收拾好，准备下班回家。",
    "这位{p}的手艺在附近很有名。",
    "年轻的{p}虚心向老师傅请教经验。",
    "{p}一边哼着歌一边{v}房间里的东西。",
]
TEMPLATES_PL = [  # person x place frames
    "这位{p}去{l}参加了一个行业会议。",
    "{p}的老家在{l}，他每年春节都回去。",
    "听说{l}的冬天很冷，{p}特意带了厚衣服。",
    "{p}在{l}住了五年，对那里的街道很熟悉。",
]
TEMPLATES_O = [  # object frames
    "桌子上放着一把{o}，不知道是谁的。",
    "这把{o}用了十年，还是很好用。",
    "他把{o}落在出租车上了，急得团团转。",
    "商店里的{o}正好在打折，买的人很多。",
    "奶奶的{o}找不到了，大家帮着到处找。",
    "新买的{o}质量不错，价钱也公道。",
]
TEMPLATES_F = [  # food frames
    "中午我们吃的是{f}，味道很地道。",
    "妈妈做的{f}比饭馆的还好吃。",
    "这家小店的{f}远近闻名，常常要排队。",
    "他一口气吃了两碗{f}，直说过瘾。",
    "过节的时候，家家户户都要做{f}。",
]
TEMPLATES_A = [  # adjective frames
    "房间收拾得很{a}，让人心情舒畅。",
    "这件衣服看起来特别{a}。",
    "院子被打扫得十分{a}。",
]
TEMPLATES_W = [  # weather frames
    "今天天气{w}，适合到郊外走一走。",
    "一连几天都是{w}的天气，庄稼长势很好。",
]


def build() -> list[str]:
    out = list(HAND)
    for t in TEMPLATES_PV:
        for i, p in enumerate(PEOPLE):
            out.append(t.format(p=p, v=VERBS[i % len(VERBS)]))
    for t in TEMPLATES_PL:
        for i, p in enumerate(PEOPLE):
            out.append(t.format(p=p, l=PLACES[i % len(PLACES)]))
    for t in TEMPLATES_O:
        for o in OBJECTS:
            out.append(t.format(o=o))
    for t in TEMPLATES_F:
        for f in FOODS:
            out.append(t.format(f=f))
    for t in TEMPLATES_A:
        for a in ADJS:
            out.append(t.format(a=a))
    for t in TEMPLATES_W:
        for w in WEATHER:
            out.append(t.format(w=w))
    # pairwise frames multiply coverage: every place x a rotating food/verb
    for i, lp in enumerate(PLACES):
        out.append(f"{lp}的{FOODS[i % len(FOODS)]}很有特色，值得一尝。")
        out.append(f"我们在{lp}的老街上逛了整整一个下午。")
        out.append(f"从这里到{lp}的高铁只要几个小时。")
    for i, o in enumerate(OBJECTS):
        out.append(f"他把{o}擦得干干净净，放回了原处。")
        out.append(f"这种{o}的做工比从前{ADJS[i % len(ADJS)]}多了。")
    for i, p in enumerate(PEOPLE):
        out.append(f"{p}们正在开会讨论下个月的工作安排。")
        out.append(f"当一名{p}是他从小的梦想。")
    for i, f in enumerate(FOODS):
        out.append(f"学校食堂今天供应{f}，窗口前排起了长队。")
    for i, v in enumerate(VERBS):
        out.append(f"师傅手把手地教徒弟怎么{v}。")
        out.append(f"这批零件还需要重新{v}一遍。")
    # person x object: possession/usage frames
    for i, p in enumerate(PEOPLE):
        o = OBJECTS[i % len(OBJECTS)]
        out.append(f"{p}随身带着一个{o}，用起来很方便。")
        out.append(f"那位{p}的{o}是女儿送的生日礼物。")
        out.append(f"{p}下班后发现{o}不见了，找了半天。")
    # place x weather / travel frames
    for i, lp in enumerate(PLACES):
        w = WEATHER[i % len(WEATHER)]
        out.append(f"这几天{lp}的天气比较{w}，出门要注意。")
        out.append(f"他计划明年春天去{lp}旅游一趟。")
        out.append(f"{lp}火车站前的广场最近重新修整过了。")
        out.append(f"电视里正在介绍{lp}的风土人情。")
    # food x adjective / cooking frames
    for i, f in enumerate(FOODS):
        out.append(f"刚出锅的{f}热气腾腾，香味扑鼻。")
        out.append(f"他跟外婆学会了做{f}的手艺。")
        out.append(f"街口那家店的{f}分量足，价钱也实在。")
    # object x verb: maintenance frames
    for i, o in enumerate(OBJECTS):
        v = VERBS[i % len(VERBS)]
        out.append(f"周末他把家里的{o}仔细{v}了一遍。")
        out.append(f"说明书上写着这种{o}要定期{v}。")
    # adjective comparison frames
    for i, a in enumerate(ADJS):
        out.append(f"新教室比旧教室{a}得多，大家都很满意。")
        out.append(f"这批样品做得相当{a}，客户当场就签了合同。")
    # person x person: interaction frames
    for i, p in enumerate(PEOPLE):
        q = PEOPLE[(i + 7) % len(PEOPLE)]
        out.append(f"{p}和{q}合作完成了这个项目。")
        out.append(f"{p}向{q}请教了几个专业问题。")
    # numbers / dates / quantities (digit normalization exercise)
    for n in range(1, 29):
        out.append(f"会议定于{n}号上午九点半在三楼会议室举行。")
        out.append(f"这批货一共{n * 37}件，明天全部发出。")
    # person x food: daily-life frames
    for i, p in enumerate(PEOPLE):
        f = FOODS[i % len(FOODS)]
        out.append(f"{p}中午就着咸菜吃了一碗{f}。")
        out.append(f"忙了一上午，{p}想吃一顿{f}犒劳自己。")
    # place x object: commerce frames
    for i, lp in enumerate(PLACES):
        o = OBJECTS[i % len(OBJECTS)]
        out.append(f"他在{lp}的商场里买了一个{o}。")
        out.append(f"{lp}产的{o}在全国都小有名气。")
    # verb x object frames
    for i, v in enumerate(VERBS):
        o = OBJECTS[(i + 5) % len(OBJECTS)]
        out.append(f"请先把这个{o}{v}一下再交回来。")
        out.append(f"他花了一个钟头才把{o}{v}完。")
    # weather x activity frames
    for i, w in enumerate(WEATHER):
        out.append(f"趁着天气{w}，大家把被褥都晾了出来。")
        out.append(f"天气这么{w}，比赛恐怕要改期了。")
        out.append(f"{w}的日子里，屋里比屋外舒服多了。")
    # adjective x object frames
    for i, a in enumerate(ADJS):
        o = OBJECTS[(i + 11) % len(OBJECTS)]
        out.append(f"柜台里摆着一排{a}的{o}。")
        out.append(f"她挑了半天，选中了那个最{a}的{o}。")
    # person x adjective: description frames
    for i, p in enumerate(PEOPLE):
        a = ADJS[(i + 3) % len(ADJS)]
        out.append(f"这位{p}的工作间收拾得格外{a}。")
        out.append(f"大家都说这位{p}办事特别认真。")
        out.append(f"{p}把自己的经验写成了一本小册子。")
    # food x place: restaurant frames
    for i, f in enumerate(FOODS):
        lp = PLACES[(i + 9) % len(PLACES)]
        out.append(f"{lp}街头的{f}摊子总是围满了人。")
        out.append(f"来{lp}不尝一尝{f}，等于白来一趟。")
    # object x person: service frames
    for i, o in enumerate(OBJECTS):
        p = PEOPLE[(i + 13) % len(PEOPLE)]
        out.append(f"{p}帮邻居修好了那个{o}。")
    return out


def main() -> None:
    dst = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "bert_vits2_tpu", "text", "assets", "zh_corpus.txt",
    )
    sents = build()
    with open(dst, "w", encoding="utf-8") as f:
        f.write("# ZH divergence corpus — generated by tools/build_zh_corpus.py\n")
        f.write("# (hand sentences + template x vocabulary expansion); one\n")
        f.write("# sentence per line. Used by tools/zh_divergence.py.\n")
        f.write("\n".join(sents) + "\n")
    print(f"{len(sents)} sentences -> {dst}")


if __name__ == "__main__":
    main()
